"""SHVC inter-layer upsampling on device (JAX).

Separable resample as two MXU matmuls: the host turns the per-output
tap plan (scale/phase LUT) into banded resampling matrices
H [el_w, bl_w] / V [el_h, bl_h] (8 or 4 nonzeros per row), and the
device computes V @ (src @ H^T) as integer dot products — XLA gathers
degrade on TPU (~200 ms/frame measured), the matmul form runs in
milliseconds. Bit-exact vs ops/upsample_np.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .upsample_np import UP_FILTER_LUMA, UP_FILTER_CHROMA, scale_add


def _axis_plan(n_out, n_in, scale, add, ntaps, filt, left=0, right=0,
               end_minus1=False, off16=0):
    half = (ntaps >> 1) - 1
    end = n_out - right - (1 if end_minus1 else 0)
    idx = np.zeros((n_out, ntaps), np.int32)
    coef = np.zeros((n_out, ntaps), np.int32)
    for i in range(n_out):
        x = min(max(i, left), end)
        ref16 = (((x - left) * scale + add) >> 12) + off16
        phase = ref16 & 15
        refpos = (ref16 >> 4) - half
        idx[i] = np.clip(np.arange(refpos, refpos + ntaps), 0, n_in - 1)
        coef[i] = filt[phase]
    return idx, coef


def _axis_matrix(idx, coef, n_in, col_map=None):
    """Tap plan -> dense banded resampling matrix [n_out, n_in] int32
    (border-clipped duplicate taps accumulate, matching the gather+sum
    semantics)."""
    n_out = idx.shape[0]
    m = np.zeros((n_out, n_in), np.int32)
    np.add.at(m, (np.arange(n_out)[:, None], idx), coef)
    if col_map is not None:
        m = m[col_map]
    return m


@partial(jax.jit, static_argnames=("bit_depth",))
def _upsample_kernel(bl, hmat_t, vmat, bit_depth: int):
    """V @ (src @ H^T): both contractions on the MXU with int32
    accumulation (|acc| <= 8*64 * 8*64 * 1023 < 2^31, exact)."""
    src = bl.astype(jnp.int32)
    temp = jax.lax.dot_general(src, hmat_t, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    acc = jax.lax.dot_general(vmat, temp, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    nshift = 20 - 8
    return jnp.clip((acc + (1 << (nshift - 1))) >> nshift,
                    0, (1 << bit_depth) - 1)


_PLAN_CACHE: dict = {}


def _plans(bl_w, bl_h, el_w, el_h, luma, win, off16_y, phase_align=0):
    """Cached (hmat_t [bl_w, el_w], vmat [el_h, bl_h]) device matrices
    for one (BL dims -> EL dims) plane mapping — computed once per
    stream."""
    key = (bl_w, bl_h, el_w, el_h, luma, win, off16_y, phase_align)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    filt = UP_FILTER_LUMA if luma else UP_FILTER_CHROMA
    ntaps = filt.shape[1]
    left, right, top, bottom = win
    if luma:
        sx, ax = scale_add(bl_w, el_w)
        sy, ay = scale_add(bl_h, el_h)
    else:
        # chroma reuses the luma-derived scales (hevc.c:487); vertical
        # phase is 1 (+alignment), and the vertical position has the
        # -4/16 offset (hevcdsp_template.c chroma pass)
        sx, _ = scale_add(bl_w * 2, el_w * 2)
        sy, _ = scale_add(bl_h * 2, el_h * 2)
        ax = ((phase_align * sx + 2) >> 2) + (1 << 11)
        ay = (((1 + phase_align) * sy + 2) >> 2) + (1 << 11)
    hidx, hcoef = _axis_plan(el_w, bl_w, sx, ax, ntaps, filt, left, right)
    vidx, vcoef = _axis_plan(el_h, bl_h, sy, ay, ntaps, filt, top, bottom,
                             end_minus1=True, off16=off16_y)
    col_map = np.clip(np.arange(el_w), left,
                      el_w - right - 1).astype(np.int32)
    hmat = _axis_matrix(hidx, hcoef, bl_w, col_map)
    vmat = _axis_matrix(vidx, vcoef, bl_h)
    out = (jnp.asarray(np.ascontiguousarray(hmat.T)), jnp.asarray(vmat))
    if len(_PLAN_CACHE) > 64:
        _PLAN_CACHE.clear()
    _PLAN_CACHE[key] = out
    return out


def upsample_il_frame_dev(planes_dev, el_w, el_h, bit_depth=8,
                          hs=1, vs=1):
    """Device-resident inter-layer reference: upsample the decoded BL
    [Y, Cb, Cr] device planes to EL dimensions entirely on device —
    the production SHVC path (whole-frame variant of ff_upsample_block,
    hevc_filter.c:1175-1370; scale/phase rules hevc.c:473-487). Returns
    three device arrays; nothing crosses the host wire."""
    y = planes_dev[0]
    bl_h, bl_w = y.shape
    out = [_upsample_kernel(y, *_plans(bl_w, bl_h, el_w, el_h, True,
                                       (0, 0, 0, 0), 0),
                            bit_depth=bit_depth)]
    for c in (1, 2):
        p = planes_dev[c]
        bh, bw = p.shape
        out.append(_upsample_kernel(
            p, *_plans(bw, bh, el_w >> hs, el_h >> vs, False,
                       (0, 0, 0, 0), -4),
            bit_depth=bit_depth))
    return out


def upsample_plane_jax(bl, el_w, el_h, scale_x, add_x, scale_y, add_y,
                       bit_depth=8, luma=True, win=(0, 0, 0, 0)):
    filt = UP_FILTER_LUMA if luma else UP_FILTER_CHROMA
    ntaps = filt.shape[1]
    left, right, top, bottom = win
    h_bl, w_bl = bl.shape
    hidx, hcoef = _axis_plan(el_w, w_bl, scale_x, add_x, ntaps, filt,
                             left, right)
    vidx, vcoef = _axis_plan(el_h, h_bl, scale_y, add_y, ntaps, filt,
                             top, bottom, end_minus1=True)
    col_map = np.clip(np.arange(el_w), left, el_w - right - 1).astype(np.int32)
    hmat = _axis_matrix(hidx, hcoef, w_bl, col_map)
    vmat = _axis_matrix(vidx, vcoef, h_bl)
    out = _upsample_kernel(jnp.asarray(np.asarray(bl, np.int32)),
                           jnp.asarray(np.ascontiguousarray(hmat.T)),
                           jnp.asarray(vmat), bit_depth=bit_depth)
    return np.asarray(out)
