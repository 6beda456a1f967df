"""Batched intra prediction on device (all 35 modes, one TU size bucket per
call). Bit-exact vs ops/intra_np.py.

TPU mapping: within a dependency level (computed by the host packer), TUs
are independent -> one fused XLA program predicts N TUs of size s at once:
vector gathers for reference samples, cummax-based substitution, mask-select
across mode families, block scatter of the reconstruction. The sequential
wavefront over levels is a lax.scan in the pipeline (models/pipeline.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .intra_np import ANGLES, INV_ANGLE

_ANGLE_TAB = jnp.asarray(np.array((0, 0) + ANGLES, np.int32))  # index by mode
_INV_TAB_NP = np.zeros(35, np.int32)
for _m in range(2, 35):
    _a = ANGLES[_m - 2]
    _INV_TAB_NP[_m] = INV_ANGLE.get(_a, 0)
_INV_TAB = jnp.asarray(_INV_TAB_NP)


@partial(jax.jit, static_argnames=("s", "bit_depth", "strong_smoothing"),
         donate_argnums=(0, 3))
def predict_batch_level(planes, res_planes, stacked, counter, s: int,
                        bit_depth: int, strong_smoothing: bool):
    """predict_batch over one level taken from a [G, cap, ...] stacked
    group at device-resident `counter` (returned incremented) — the
    wavefront loop runs with zero per-level host->device transfers."""
    a = jax.tree_util.tree_map(
        lambda t: jax.lax.dynamic_index_in_dim(t, counter, 0,
                                               keepdims=False),
        stacked)
    out = _predict_batch_impl(planes, res_planes, a["valid"], a["plane"],
                              a["x"], a["y"], a["mode"], a["avail"],
                              a["filt"], s, bit_depth, strong_smoothing)
    return out, counter + 1


@partial(jax.jit, static_argnames=("s", "bit_depth", "strong_smoothing"),
         donate_argnums=(0,))
def predict_batch(planes, res_planes, valid, plane_idx, x, y, mode, avail,
                  filt, s: int, bit_depth: int, strong_smoothing: bool):
    return _predict_batch_impl(planes, res_planes, valid, plane_idx, x, y,
                               mode, avail, filt, s, bit_depth,
                               strong_smoothing)


def _predict_batch_impl(planes, res_planes, valid, plane_idx, x, y, mode,
                        avail, filt, s: int, bit_depth: int,
                        strong_smoothing: bool):
    """Predict + residual-add + scatter one level's TUs of size s.

    planes/res_planes: int32 [4, Hp, Wp] (plane 3 trash).
    valid/plane_idx/x/y/mode: [N] int32; avail: [N, 4s+1] bool; filt: [N] bool.
    Returns updated planes."""
    N = x.shape[0]
    Hp, Wp = planes.shape[1], planes.shape[2]
    n_ref = 4 * s + 1
    corner_i = 2 * s
    maxv = (1 << bit_depth) - 1

    # ---- gather reference samples -----------------------------------------
    i_arr = jnp.arange(2 * s)
    cx_left = (x - 1)[:, None] * jnp.ones((N, 2 * s), jnp.int32)
    cy_left = y[:, None] + (2 * s - 1 - i_arr)[None, :]
    cx_top = x[:, None] + i_arr[None, :]
    cy_top = (y - 1)[:, None] * jnp.ones((N, 2 * s), jnp.int32)
    cxs = jnp.concatenate([cx_left, (x - 1)[:, None], cx_top], axis=1)
    cys = jnp.concatenate([cy_left, (y - 1)[:, None], cy_top], axis=1)
    cxs = jnp.clip(cxs, 0, Wp - 1)
    cys = jnp.clip(cys, 0, Hp - 1)
    ref = planes[plane_idx[:, None], cys, cxs]          # [N, 4s+1]

    # ---- substitution (8.4.4.2.2) -----------------------------------------
    idx = jnp.arange(n_ref)[None, :]
    ff = jax.lax.cummax(jnp.where(avail, idx, -1), axis=1)
    first_avail = jnp.argmax(avail, axis=1)
    fallback = jnp.take_along_axis(ref, first_avail[:, None], axis=1)
    sub = jnp.where(ff >= 0,
                    jnp.take_along_axis(ref, jnp.maximum(ff, 0), axis=1),
                    fallback)
    any_avail = avail.any(axis=1)
    ref = jnp.where(any_avail[:, None], sub, 1 << (bit_depth - 1))

    # ---- neighbour filtering (8.4.4.2.3) ----------------------------------
    if s > 4:
        f121 = ref.copy()
        mid = (ref[:, :-2] + 2 * ref[:, 1:-1] + ref[:, 2:] + 2) >> 2
        f121 = f121.at[:, 1:-1].set(mid)
        min_dist = jnp.minimum(jnp.abs(mode - 26), jnp.abs(mode - 10))
        thres = {8: 7, 16: 1, 32: 0}[s]
        want_filter = filt & (mode != 1) & (min_dist > thres)
        if s == 32 and strong_smoothing:
            corner = ref[:, corner_i]
            topend = ref[:, n_ref - 1]
            leftend = ref[:, 0]
            t_mid = ref[:, corner_i + s]      # top[s-1]
            l_mid = ref[:, s]                 # left[s-1]
            th = 1 << (bit_depth - 5)
            strong = (jnp.abs(corner + topend - 2 * t_mid) < th) & \
                     (jnp.abs(corner + leftend - 2 * l_mid) < th) & \
                     (plane_idx == 0)   # bilinear smoothing is luma-only
                                        # even in 4:4:4 (hevcpred_template.c:296)
            k = jnp.arange(2 * s - 1)
            top_bl = ((63 - k)[None, :] * corner[:, None] +
                      (k + 1)[None, :] * topend[:, None] + 32) >> 6
            left_bl = ((63 - k)[None, :] * corner[:, None] +
                       (k + 1)[None, :] * leftend[:, None] + 32) >> 6
            fstrong = ref
            fstrong = fstrong.at[:, corner_i + 1:corner_i + 2 * s].set(top_bl)
            # left_bl[yy] -> ref index 2s-1-yy, yy=0..2s-2 -> indices 1..2s-1
            fstrong = fstrong.at[:, 1:2 * s].set(left_bl[:, ::-1])
            f121 = jnp.where(strong[:, None], fstrong, f121)
        ref = jnp.where(want_filter[:, None], f121, ref)

    # ---- derive left / corner / top ---------------------------------------
    left = ref[:, :2 * s][:, ::-1]       # left[k] = p[-1][k]
    corner = ref[:, corner_i]
    top = ref[:, corner_i + 1:]

    log2s = int(np.log2(s))
    ar = jnp.arange(s)

    # ---- planar -----------------------------------------------------------
    l_y = left[:, :s]
    t_x = top[:, :s]
    t_s = top[:, s]
    l_s = left[:, s]
    planar = (((s - 1 - ar)[None, None, :] * l_y[:, :, None] +
               (ar + 1)[None, None, :] * t_s[:, None, None] +
               (s - 1 - ar)[None, :, None] * t_x[:, None, :] +
               (ar + 1)[None, :, None] * l_s[:, None, None] + s)
              >> (log2s + 1))

    # ---- DC ---------------------------------------------------------------
    dc = (jnp.sum(t_x, axis=1) + jnp.sum(l_y, axis=1) + s) >> (log2s + 1)
    dcb = dc[:, None, None] * jnp.ones((N, s, s), jnp.int32)
    if s < 32:
        row0 = (t_x + 3 * dc[:, None] + 2) >> 2
        col0 = (l_y + 3 * dc[:, None] + 2) >> 2
        c00 = (l_y[:, 0] + 2 * dc + t_x[:, 0] + 2) >> 2
        is_luma = plane_idx == 0
        dc_f = dcb
        dc_f = dc_f.at[:, 0, :].set(row0)
        dc_f = dc_f.at[:, :, 0].set(col0)
        dc_f = dc_f.at[:, 0, 0].set(c00)
        dcb = jnp.where(is_luma[:, None, None], dc_f, dcb)

    # ---- angular ----------------------------------------------------------
    angle = _ANGLE_TAB[jnp.clip(mode, 0, 34)]
    inv = _INV_TAB[jnp.clip(mode, 0, 34)]
    is_ver = mode >= 18
    main = jnp.where(is_ver[:, None], top, left)     # [N, 2s]
    side = jnp.where(is_ver[:, None], left, top)
    r = jnp.zeros((N, 3 * s + 2), jnp.int32)
    r = r.at[:, s].set(corner)
    r = r.at[:, s + 1:s + 1 + 2 * s].set(main)
    # negative projection: i = -1..-s at positions s-1..0
    neg_i = -(jnp.arange(s) + 1)                      # [-1, -2, ... -s]
    proj = jnp.clip(-1 + ((neg_i[None, :] * inv[:, None] + 128) >> 8),
                    0, 2 * s - 1)
    r_neg = jnp.take_along_axis(side, proj, axis=1)   # [N, s]
    r_low = r_neg[:, ::-1]                            # positions 0..s-1
    use_neg = (angle < 0)[:, None]
    r = r.at[:, 0:s].set(jnp.where(use_neg, r_low, r[:, 0:s]))
    pos = ar + 1                                      # main-axis coordinate+1
    iidx = (pos[None, :] * angle[:, None]) >> 5       # [N, s]
    fact = (pos[None, :] * angle[:, None]) & 31
    g1 = s + ar[None, None, :] + iidx[:, :, None] + 1  # [N, s, s]
    g1 = jnp.clip(g1, 0, 3 * s + 1)
    g2 = jnp.clip(g1 + 1, 0, 3 * s + 1)
    rv1 = jnp.take_along_axis(r[:, None, :] * jnp.ones((N, s, 1), jnp.int32),
                              g1, axis=2)
    rv2 = jnp.take_along_axis(r[:, None, :] * jnp.ones((N, s, 1), jnp.int32),
                              g2, axis=2)
    pred_main = ((32 - fact)[:, :, None] * rv1 +
                 fact[:, :, None] * rv2 + 16) >> 5
    angular = jnp.where(is_ver[:, None, None], pred_main,
                        jnp.transpose(pred_main, (0, 2, 1)))
    if s < 32:
        is_luma = plane_idx == 0
        # mode 26: first column adjust; mode 10: first row
        col = jnp.clip(top[:, 0][:, None] + ((l_y - corner[:, None]) >> 1),
                       0, maxv)
        row = jnp.clip(left[:, 0][:, None] + ((t_x - corner[:, None]) >> 1),
                       0, maxv)
        m26 = (mode == 26) & is_luma
        m10 = (mode == 10) & is_luma
        angular = jnp.where(m26[:, None, None],
                            angular.at[:, :, 0].set(col), angular)
        angular = jnp.where(m10[:, None, None],
                            angular.at[:, 0, :].set(row), angular)

    pred = jnp.where((mode == 0)[:, None, None], planar,
                     jnp.where((mode == 1)[:, None, None], dcb, angular))

    # ---- residual add + scatter ------------------------------------------
    ys = y[:, None, None] + ar[None, :, None]
    xs = x[:, None, None] + ar[None, None, :]
    pi = jnp.where(valid.astype(bool), plane_idx, 3)
    pib = pi[:, None, None] * jnp.ones((N, s, s), jnp.int32)
    resb = res_planes[pib, jnp.clip(ys, 0, Hp - 1), jnp.clip(xs, 0, Wp - 1)]
    recon = jnp.clip(pred + resb, 0, maxv)
    return planes.at[pib, ys, xs].set(recon, mode="drop")
