"""Inter prediction on device (JAX) — dense-phase formulation.

Instead of per-PU windowed interpolation (the reference's qpel/epel calls),
the whole reference plane is filtered once per fractional phase (separable
taps on the VPU over a replicate-padded frame), and prediction becomes one
per-pixel gather by (ref slot, phase, integer offset). MVs/phases come from
the dense per-4x4 motion grids the parser already emits — the layout the
TPU wants.  Bit-exact vs ops/mc_np.py (the unified two-stage filtering with
identity phase rows reproduces the reference's h-only/v-only/copy paths
exactly).

Pad margin of 8 makes out-of-range clamped gathers land in fully-constant
filtered regions, which equals the reference's replicate edge emulation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mc_np import QPEL_FILTERS, EPEL_FILTERS

PAD = 8

# phase 0 = identity row (64 at the "center" tap used by the put paths)
_QPEL_ALL = np.zeros((4, 8), np.int32)
_QPEL_ALL[0, 3] = 64
_QPEL_ALL[1:] = QPEL_FILTERS
_EPEL_ALL = np.zeros((8, 4), np.int32)
_EPEL_ALL[0, 1] = 64
_EPEL_ALL[1:] = EPEL_FILTERS


@partial(jax.jit, static_argnames=("bit_depth", "is_luma", "hs", "vs"))
def mc_dense_put(refs, mvx, mvy, slot, bit_depth: int, is_luma: bool,
                 hs: int = 1, vs: int = 1):
    """refs: [R, H, W] int32 reference planes. mvx/mvy/slot: [H, W] int32
    (luma quarter-pel MV units; slot indexes refs). hs/vs: chroma
    subsampling shifts — chroma offset/phase follow hevc.c:1807-1813
    (offset = mv >> (2+shift), phase = (mv & mask) << (1-shift)).
    Returns the 14-bit 'put' intermediate [H, W] int32."""
    R, H, W = refs.shape
    taps = 8 if is_luma else 4
    fbx = 2 if is_luma else 2 + hs
    fby = 2 if is_luma else 2 + vs
    pmx = 1 if is_luma else 1 << (1 - hs)
    pmy = 1 if is_luma else 1 << (1 - vs)
    nphase = 4 if is_luma else 8
    filt = jnp.asarray(_QPEL_ALL if is_luma else _EPEL_ALL)
    center = 3 if is_luma else 1
    shift1 = bit_depth - 8

    padded = jnp.pad(refs, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="edge")
    # horizontal filtering, all phases: hf[r, p, y, i] over padded width
    wn = W + 2 * PAD - taps + 1
    cols = jnp.arange(wn)
    hst = jnp.stack([padded[:, :, k:k + wn] for k in range(taps)], axis=-1)
    hf = jnp.einsum("ryxk,pk->rpyx", hst, filt,
                    preferred_element_type=jnp.int32)
    hf = hf >> shift1                       # 14-bit intermediate base
    # vertical filtering of hf, all phases: vf[r, p, q, j, i]
    hn = hf.shape[2] - taps + 1
    vst = jnp.stack([hf[:, :, k:k + hn, :] for k in range(taps)], axis=-1)
    vf = jnp.einsum("rpjik,qk->rpqji", vst, filt,
                    preferred_element_type=jnp.int32)
    vf = vf >> 6
    # per-pixel gather
    ys, xs = jnp.mgrid[0:H, 0:W]
    sx = xs + (mvx >> fbx)
    sy = ys + (mvy >> fby)
    fx = ((mvx & ((1 << fbx) - 1)) * pmx).astype(jnp.int32)
    fy = ((mvy & ((1 << fby) - 1)) * pmy).astype(jnp.int32)
    gi = jnp.clip(sx + PAD - center, 0, wn - 1)
    gj = jnp.clip(sy + PAD - center, 0, hn - 1)
    flat = vf.reshape(R * nphase * nphase, hn, wn)
    lin = (slot * nphase + fx) * nphase + fy
    return flat[lin, gj, gi]


@partial(jax.jit, static_argnames=("bit_depth", "denom"),
         donate_argnums=(0,))
def inter_combine_w(planes, res_planes, put0, put1, pf, w0, o0, w1, o1,
                    plane_idx, bit_depth: int, denom: int):
    """Weighted-prediction variant of inter_combine: w*/o* are per-pixel
    int32 weight/offset grids selected by list+ref_idx (mc_np.uni_w/bi_w
    formulas; put_hevc_*_uni_w/bi_w behavior)."""
    H, W = put0.shape
    maxv = (1 << bit_depth) - 1
    osc = 1 << (bit_depth - 8)
    shift_u = denom + 14 - bit_depth
    off_u = 1 << (shift_u - 1) if shift_u > 0 else 0
    uni0 = ((put0 * w0 + off_u) >> shift_u) + o0 * osc
    uni1 = ((put1 * w1 + off_u) >> shift_u) + o1 * osc
    log2wd = denom + (15 - bit_depth) - 1
    bi = (put1 * w1 + put0 * w0 +
          ((o0 * osc + o1 * osc + 1) << log2wd)) >> (log2wd + 1)
    pred = jnp.where(pf == 3, bi, jnp.where(pf == 2, uni1, uni0))
    pred = jnp.clip(pred, 0, maxv)
    res = res_planes[plane_idx, :H, :W]
    recon = jnp.clip(pred + res, 0, maxv)
    cur = planes[plane_idx, :H, :W]
    out = jnp.where(pf > 0, recon, cur)
    return planes.at[plane_idx, :H, :W].set(out)


@partial(jax.jit, static_argnames=("bit_depth",),
         donate_argnums=(0,))
def inter_combine(planes, res_planes, put0, put1, pf, plane_idx,
                  bit_depth: int):
    """Final prediction + residual for one plane of the frame.
    put0/put1: [H, W] 14-bit intermediates; pf: [H, W] pred_flag grid
    (0 intra, 1 L0, 2 L1, 3 BI); writes plane `plane_idx` of the stack."""
    H, W = put0.shape
    maxv = (1 << bit_depth) - 1
    shift_u = 14 - bit_depth
    off_u = 1 << (shift_u - 1)
    shift_b = 15 - bit_depth
    off_b = 1 << (shift_b - 1)
    uni0 = (put0 + off_u) >> shift_u
    uni1 = (put1 + off_u) >> shift_u
    bi = (put0 + put1 + off_b) >> shift_b
    pred = jnp.where(pf == 3, bi, jnp.where(pf == 2, uni1, uni0))
    pred = jnp.clip(pred, 0, maxv)
    res = res_planes[plane_idx, :H, :W]
    recon = jnp.clip(pred + res, 0, maxv)
    cur = planes[plane_idx, :H, :W]
    out = jnp.where(pf > 0, recon, cur)
    return planes.at[plane_idx, :H, :W].set(out)
