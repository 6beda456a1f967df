"""SHVC inter-layer upsampling on device (JAX).

Separable resample as two dense contractions: host precomputes per-output
tap indices and coefficients from the scale/phase LUT; the device gathers
8 (4) tap rows/columns and contracts on the VPU. Bit-exact vs
ops/upsample_np.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .upsample_np import UP_FILTER_LUMA, UP_FILTER_CHROMA, scale_add


def _axis_plan(n_out, n_in, scale, add, ntaps, filt, left=0, right=0,
               end_minus1=False):
    half = (ntaps >> 1) - 1
    end = n_out - right - (1 if end_minus1 else 0)
    idx = np.zeros((n_out, ntaps), np.int32)
    coef = np.zeros((n_out, ntaps), np.int32)
    for i in range(n_out):
        x = min(max(i, left), end)
        ref16 = ((x - left) * scale + add) >> 12
        phase = ref16 & 15
        refpos = (ref16 >> 4) - half
        idx[i] = np.clip(np.arange(refpos, refpos + ntaps), 0, n_in - 1)
        coef[i] = filt[phase]
    return idx, coef


@partial(jax.jit, static_argnames=("bit_depth",))
def _upsample_kernel(bl, hidx, hcoef, vidx, vcoef, col_map, bit_depth: int):
    src = bl.astype(jnp.int32)
    # horizontal: temp[r, i] = sum_k src[r, hidx[i,k]] * hcoef[i,k]
    gath = src[:, hidx]                      # [H_bl, el_w, taps]
    temp = jnp.sum(gath * hcoef[None], axis=2)
    temp = temp[:, col_map]
    # vertical: out[j, i] = sum_k temp[vidx[j,k], i] * vcoef[j,k]
    gv = temp[vidx]                          # [el_h, taps, el_w]
    acc = jnp.sum(gv * vcoef[:, :, None], axis=1)
    nshift = 20 - 8
    return jnp.clip((acc + (1 << (nshift - 1))) >> nshift,
                    0, (1 << bit_depth) - 1)


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
    out = _upsample_kernel(jnp.asarray(np.asarray(bl, np.int32)),
                           jnp.asarray(hidx), jnp.asarray(hcoef.astype(np.int32)),
                           jnp.asarray(vidx), jnp.asarray(vcoef.astype(np.int32)),
                           jnp.asarray(col_map), bit_depth=bit_depth)
    return np.asarray(out)
