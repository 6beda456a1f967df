"""Inter prediction on device (JAX) — two-stage dense formulation.

Stage 1 (per decoded picture, cached across the frames that reference
it): the reference plane is horizontally filtered at ALL fractional
phases — P=4 (qpel) or P=8 (epel) int16 planes, the reference's int16
`tmp` intermediate materialized once per phase column
(put_hevc_qpel/epel_h, hevcdsp_template.c:610-1608).

Stage 2 (per predicted frame): prediction is per-pixel vertical
filtering over `taps` gathered rows of the stage-1 planes, indexed by
(ref slot, x-phase, integer offset); the y-phase selects the filter row
per pixel. MVs/phases come from the per-4x4 motion grids the parser
emits, upsampled to pixel granularity ON DEVICE so a frame's upload is
just the [h4,w4] grids.

HBM cost is O(refs x P x frame) int16 — 4x (luma) / 8x (chroma) less
than the previous all-phase-pair prefilter, with no per-frame
recompute for reused references. Bit-exact vs ops/mc_np.py (identity
phase rows reproduce the h-only/v-only/copy paths exactly).

Pad margin of 8 makes out-of-range clamped gathers land in fully-
constant filtered regions, which equals the reference's replicate edge
emulation (videodsp emulated_edge_mc behavior).
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


@partial(jax.jit, static_argnames=("bit_depth", "is_luma"))
def mc_hprefilter(ref, bit_depth: int, is_luma: bool):
    """ref: [H, W] int32 plane -> hf [P, H+2*PAD, wn] int16, the
    horizontally filtered intermediate at every phase (>> (bd-8), the
    reference's 14-bit-headroom tmp)."""
    H, W = ref.shape
    taps = 8 if is_luma else 4
    filt = _QPEL_ALL if is_luma else _EPEL_ALL
    nphase = filt.shape[0]
    shift1 = bit_depth - 8
    padded = jnp.pad(ref, ((PAD, PAD), (PAD, PAD)), mode="edge")
    wn = W + 2 * PAD - taps + 1
    acc = jnp.zeros((nphase, H + 2 * PAD, wn), jnp.int32)
    for k in range(taps):
        col = padded[:, k:k + wn]
        w = jnp.asarray(filt[:, k])[:, None, None]
        acc = acc + col[None] * w
    return (acc >> shift1).astype(jnp.int16)


def mc_put_core(hf, mv4, slot4, bit_depth: int, is_luma: bool, hs: int,
                vs: int, H: int, W: int):
    """hf: [R, P, Hp, wn] int16 stage-1 stack. mv4: [h4, w4, 2] int
    (this list's luma quarter-pel MVs at 4x4 granularity), slot4:
    [h4, w4] int ref-slot grid. Chroma offset/phase follow
    hevc.c:1807-1813 (offset = mv >> (2+shift), phase =
    (mv & mask) << (1-shift)). Returns the 14-bit 'put' intermediate
    [H, W] int32 for this plane. (Traceable core; mc_put is the jitted
    wrapper.)"""
    mv4 = mv4.astype(jnp.int32)
    slot4 = slot4.astype(jnp.int32)
    R, P, Hp, wn = hf.shape
    taps = 8 if is_luma else 4
    fbx = 2 if is_luma else 2 + hs
    fby = 2 if is_luma else 2 + vs
    pmx = 1 if is_luma else 1 << (1 - hs)
    pmy = 1 if is_luma else 1 << (1 - vs)
    center = 3 if is_luma else 1
    filt = jnp.asarray(_QPEL_ALL if is_luma else _EPEL_ALL)
    hn = Hp - taps + 1
    reph = 4 if is_luma else 4 >> hs
    repv = 4 if is_luma else 4 >> vs
    # device-side 4x4 -> pixel upsample of the motion grids
    mvx = jnp.repeat(jnp.repeat(mv4[:, :, 0], repv, 0), reph, 1)[:H, :W]
    mvy = jnp.repeat(jnp.repeat(mv4[:, :, 1], repv, 0), reph, 1)[:H, :W]
    slot = jnp.repeat(jnp.repeat(slot4, repv, 0), reph, 1)[:H, :W]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sx = xs + (mvx >> fbx)
    sy = ys + (mvy >> fby)
    fx = ((mvx & ((1 << fbx) - 1)) * pmx).astype(jnp.int32)
    fy = ((mvy & ((1 << fby) - 1)) * pmy).astype(jnp.int32)
    gi = jnp.clip(sx + PAD - center, 0, wn - 1)
    gj = jnp.clip(sy + PAD - center, 0, hn - 1)
    flat = hf.reshape(R * P, Hp, wn)
    lin = slot * P + fx
    acc = jnp.zeros((H, W), jnp.int32)
    for j in range(taps):
        rows = flat[lin, gj + j, gi].astype(jnp.int32)
        wj = filt[:, j][fy]
        acc = acc + rows * wj
    return acc >> 6


mc_put = partial(jax.jit, static_argnames=(
    "bit_depth", "is_luma", "hs", "vs", "H", "W"))(mc_put_core)


@partial(jax.jit, static_argnames=("bit_depth", "is_luma"))
def mc_prefilter_pairs(ref, bit_depth: int, is_luma: bool):
    """All-phase-PAIR prefilter: [Py, Px, hn, wn] int16 — the fully
    filtered 'put' intermediate at every (y-phase, x-phase). Cached per
    decoded picture, this turns stage 2 into a single per-pixel gather
    (TPU gathers cost ~the same per element regardless of arity, so
    8 tap-gathers -> 1 gather is ~4-8x; the vertical filtering here is
    dense VPU work). Memory: 16 planes (luma) / 64 (chroma) of the
    frame in int16 — used for plane sizes where that fits comfortably
    (JaxEngine gates by pixel count; 4K falls back to the two-stage
    tap path)."""
    taps = 8 if is_luma else 4
    filt = _QPEL_ALL if is_luma else _EPEL_ALL
    nphase = filt.shape[0]
    hf = mc_hprefilter(ref, bit_depth=bit_depth, is_luma=is_luma)
    P, Hp, wn = hf.shape
    hn = Hp - taps + 1
    hf32 = hf.astype(jnp.int32)
    out = []
    for py in range(nphase):
        acc = jnp.zeros((P, hn, wn), jnp.int32)
        for t in range(taps):
            acc = acc + hf32[:, t:t + hn, :] * int(filt[py, t])
        out.append((acc >> 6).astype(jnp.int16))
    return jnp.stack(out, axis=0)          # [Py, Px, hn, wn]


def mc_put_pairs_core(pp, mv4, slot4, bit_depth: int, is_luma: bool,
                      hs: int, vs: int, H: int, W: int):
    """Stage 2 over the all-pair stack: ONE linearized gather per
    pixel. pp: [R, Py, Px, hn, wn] int16. Identical output to
    mc_put_core (the >>6 already happened inside the phase planes;
    both shift after the full 2-D filter sum)."""
    mv4 = mv4.astype(jnp.int32)
    slot4 = slot4.astype(jnp.int32)
    R, Py, Px, hn, wn = pp.shape
    fbx = 2 if is_luma else 2 + hs
    fby = 2 if is_luma else 2 + vs
    pmx = 1 if is_luma else 1 << (1 - hs)
    pmy = 1 if is_luma else 1 << (1 - vs)
    center = 3 if is_luma else 1
    reph = 4 if is_luma else 4 >> hs
    repv = 4 if is_luma else 4 >> vs
    mvx = jnp.repeat(jnp.repeat(mv4[:, :, 0], repv, 0), reph, 1)[:H, :W]
    mvy = jnp.repeat(jnp.repeat(mv4[:, :, 1], repv, 0), reph, 1)[:H, :W]
    slot = jnp.repeat(jnp.repeat(slot4, repv, 0), reph, 1)[:H, :W]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sx = xs + (mvx >> fbx)
    sy = ys + (mvy >> fby)
    fx = ((mvx & ((1 << fbx) - 1)) * pmx).astype(jnp.int32)
    fy = ((mvy & ((1 << fby) - 1)) * pmy).astype(jnp.int32)
    gi = jnp.clip(sx + PAD - center, 0, wn - 1)
    gj = jnp.clip(sy + PAD - center, 0, hn - 1)
    idx = (((slot * Py + fy) * Px + fx) * hn + gj) * wn + gi
    return pp.reshape(-1)[idx].astype(jnp.int32)


mc_put_pairs = partial(jax.jit, static_argnames=(
    "bit_depth", "is_luma", "hs", "vs", "H", "W"))(mc_put_pairs_core)


def combine_plane(put0, put1, pf, res, bit_depth: int):
    """Per-plane default (non-weighted) uni/bi combine + residual add:
    pf is the pixel-granular pred_flag (0 intra, 1 L0, 2 L1, 3 BI);
    intra pixels return 0 (the caller's prefill base). Mirrors
    inter_combine without the [4, H, W] stack."""
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
    return jnp.where(pf > 0, jnp.clip(pred + res, 0, maxv), 0)


def combine_plane_w(put0, put1, pf, res, w0, o0, w1, o1,
                    bit_depth: int, denom):
    """Per-plane weighted-prediction combine (put_hevc_*_uni_w/bi_w
    semantics; see inter_combine_w). denom may be a python int or a
    traced scalar (mesh waves carry per-frame denoms); with denom=0,
    w=1, o=0 this reduces exactly to the default combine, which lets
    unweighted pictures share a wave with weighted ones."""
    maxv = (1 << bit_depth) - 1
    osc = 1 << (bit_depth - 8)
    shift_u = denom + 14 - bit_depth
    if isinstance(denom, int):
        off_u = 1 << (shift_u - 1) if shift_u > 0 else 0
    else:
        shift_u = shift_u.astype(jnp.int32)
        off_u = jnp.where(shift_u > 0,
                          jnp.left_shift(1, jnp.maximum(shift_u - 1, 0)),
                          0)
    uni0 = ((put0 * w0 + off_u) >> shift_u) + o0 * osc
    uni1 = ((put1 * w1 + off_u) >> shift_u) + o1 * osc
    log2wd = denom + (15 - bit_depth) - 1
    bi = (put1 * w1 + put0 * w0 +
          ((o0 * osc + o1 * osc + 1) << log2wd)) >> (log2wd + 1)
    pred = jnp.where(pf == 3, bi, jnp.where(pf == 2, uni1, uni0))
    pred = jnp.clip(pred, 0, maxv)
    return jnp.where(pf > 0, jnp.clip(pred + res, 0, maxv), 0)


@partial(jax.jit,
         static_argnames=("bit_depth", "denom", "reph", "repv"),
         donate_argnums=(0,))
def inter_combine_w(planes, res_planes, put0, put1, pf4, w0, o0, w1, o1,
                    plane_idx, bit_depth: int, denom: int, reph: int,
                    repv: int):
    """Weighted-prediction variant of inter_combine: pf4/w*/o* are
    [h4, w4] int32 grids (pred_flag; weight/offset selected by
    list+ref_idx), upsampled on device (mc_np.uni_w/bi_w formulas;
    put_hevc_*_uni_w/bi_w behavior)."""
    H, W = put0.shape

    def up(a):
        return jnp.repeat(jnp.repeat(a.astype(jnp.int32), repv, 0),
                          reph, 1)[:H, :W]

    pf = up(pf4)
    w0, o0, w1, o1 = up(w0), up(o0), up(w1), up(o1)
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


@partial(jax.jit, static_argnames=("bit_depth", "reph", "repv"),
         donate_argnums=(0,))
def inter_combine(planes, res_planes, put0, put1, pf4, plane_idx,
                  bit_depth: int, reph: int, repv: int):
    """Final prediction + residual for one plane of the frame.
    put0/put1: [H, W] 14-bit intermediates; pf4: [h4, w4] pred_flag
    grid (0 intra, 1 L0, 2 L1, 3 BI), upsampled on device; writes
    plane `plane_idx` of the stack."""
    H, W = put0.shape
    pf = jnp.repeat(jnp.repeat(pf4, repv, 0), reph, 1)[:H, :W]
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
