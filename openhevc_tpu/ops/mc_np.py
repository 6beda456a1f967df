"""Motion-compensated prediction — numpy reference (H.265 8.5.3.3.3).

Behavior parity: hevcdsp_template.c put_hevc_{qpel,epel}* family
(:610-1608). "put" outputs are 14-bit intermediates; uni/bi stages add the
normative offsets/shifts. Out-of-picture reads replicate the border
(emulated_edge_mc equivalent via coordinate clamping).
"""
from __future__ import annotations

import numpy as np

QPEL_FILTERS = np.array([
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], np.int64)

EPEL_FILTERS = np.array([
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2]], np.int64)


def _gather(plane: np.ndarray, x0: int, y0: int, w: int, h: int):
    """Replicate-padded window read."""
    H, W = plane.shape
    ys = np.clip(np.arange(y0, y0 + h), 0, H - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, W - 1)
    return plane[np.ix_(ys, xs)].astype(np.int64)


def qpel_put(plane, x, y, w, h, mvx, mvy, bit_depth):
    """Luma MC 14-bit intermediate [h, w] for quarter-pel MV."""
    ix, fx = x + (mvx >> 2), mvx & 3
    iy, fy = y + (mvy >> 2), mvy & 3
    shift1 = bit_depth - 8
    if fx == 0 and fy == 0:
        return _gather(plane, ix, iy, w, h) << (14 - bit_depth)
    if fy == 0:
        src = _gather(plane, ix - 3, iy, w + 7, h)
        f = QPEL_FILTERS[fx - 1]
        out = sum(f[k] * src[:, k:k + w] for k in range(8))
        return out >> shift1
    if fx == 0:
        src = _gather(plane, ix, iy - 3, w, h + 7)
        f = QPEL_FILTERS[fy - 1]
        out = sum(f[k] * src[k:k + h, :] for k in range(8))
        return out >> shift1
    src = _gather(plane, ix - 3, iy - 3, w + 7, h + 7)
    f = QPEL_FILTERS[fx - 1]
    tmp = sum(f[k] * src[:, k:k + w] for k in range(8)) >> shift1
    f = QPEL_FILTERS[fy - 1]
    return sum(f[k] * tmp[k:k + h, :] for k in range(8)) >> 6


def epel_put(plane, x, y, w, h, mvx, mvy, bit_depth, hs=1, vs=1):
    """Chroma MC 14-bit intermediate; mv in luma quarter-pel units.
    Phase/offset per chroma subsampling (hevc.c:1807-1813):
    offset = mv >> (2+shift), phase = (mv & mask) << (1-shift)."""
    ix = x + (mvx >> (2 + hs))
    fx = (mvx & ((1 << (2 + hs)) - 1)) << (1 - hs)
    iy = y + (mvy >> (2 + vs))
    fy = (mvy & ((1 << (2 + vs)) - 1)) << (1 - vs)
    shift1 = bit_depth - 8
    if fx == 0 and fy == 0:
        return _gather(plane, ix, iy, w, h) << (14 - bit_depth)
    if fy == 0:
        src = _gather(plane, ix - 1, iy, w + 3, h)
        f = EPEL_FILTERS[fx - 1]
        out = sum(f[k] * src[:, k:k + w] for k in range(4))
        return out >> shift1
    if fx == 0:
        src = _gather(plane, ix, iy - 1, w, h + 3)
        f = EPEL_FILTERS[fy - 1]
        out = sum(f[k] * src[k:k + h, :] for k in range(4))
        return out >> shift1
    src = _gather(plane, ix - 1, iy - 1, w + 3, h + 3)
    f = EPEL_FILTERS[fx - 1]
    tmp = sum(f[k] * src[:, k:k + w] for k in range(4)) >> shift1
    f = EPEL_FILTERS[fy - 1]
    return sum(f[k] * tmp[k:k + h, :] for k in range(4)) >> 6


def uni(put, bit_depth):
    shift = 14 - bit_depth
    offset = 1 << (shift - 1) if shift > 0 else 0
    return np.clip((put + offset) >> shift, 0, (1 << bit_depth) - 1)


def bi(put0, put1, bit_depth):
    shift = 15 - bit_depth
    offset = 1 << (shift - 1)
    return np.clip((put0 + put1 + offset) >> shift, 0, (1 << bit_depth) - 1)


def uni_w(put, bit_depth, denom, wx, ox):
    shift = denom + 14 - bit_depth
    offset = 1 << (shift - 1) if shift > 0 else 0
    ox = ox * (1 << (bit_depth - 8))
    return np.clip(((put * wx + offset) >> shift) + ox,
                   0, (1 << bit_depth) - 1)


def bi_w(put0, put1, bit_depth, denom, w0, w1, o0, o1):
    shift = 15 - bit_depth
    log2wd = denom + shift - 1
    o0 = o0 * (1 << (bit_depth - 8))
    o1 = o1 * (1 << (bit_depth - 8))
    return np.clip((put1 * w1 + put0 * w0 +
                    ((o0 + o1 + 1) << log2wd)) >> (log2wd + 1),
                   0, (1 << bit_depth) - 1)


def _wp_params(weights, lx, ridx, c):
    """(weight, offset, log2 denom) for list lx / ref ridx / plane c
    from the parsed pred_weight_table (slice.py)."""
    lw, lo, cw, co = weights[lx][ridx]
    if c == 0:
        return lw, lo, weights["luma_log2_denom"]
    return cw[c - 1], co[c - 1], weights["chroma_log2_denom"]


def predict_inter_block(ref_planes_l0, ref_planes_l1, pb, bit_depth,
                        hshift=1, vshift=1, weights=None):
    """Full PU prediction -> [Y, Cb, Cr] uint arrays for the PU rect.

    pb: InterPb with l0/l1 = (mvx, mvy, ref_planes_index) resolved to the
    actual plane lists passed in (ref_planes_lX = [Y, Cb, Cr] or None).
    weights: parsed pred_weight_table or None -> weighted uni/bi paths
    (luma_mc_uni/chroma_mc_uni weight_flag behavior, hevc.c:1641/1794)."""
    outs = []
    x, y, w, h = pb.x, pb.y, pb.w, pb.h
    for c in range(3):
        if c == 0:
            px, py, pw, ph = x, y, w, h
        else:
            px, py = x >> hshift, y >> vshift
            pw, ph = w >> hshift, h >> vshift
        puts = []
        lists = []
        for ref_planes, mv, lx, ridx in (
                (ref_planes_l0, pb.l0, "l0", pb.r0),
                (ref_planes_l1, pb.l1, "l1", pb.r1)):
            if mv is None or ref_planes is None:
                continue
            mvx, mvy = mv[0], mv[1]
            if c == 0:
                puts.append(qpel_put(ref_planes[0], px, py, pw, ph,
                                     mvx, mvy, bit_depth))
            else:
                puts.append(epel_put(ref_planes[c], px, py, pw, ph,
                                     mvx, mvy, bit_depth, hshift, vshift))
            lists.append((lx, ridx))
        if len(puts) == 2:
            if weights is not None:
                w0, o0, dn = _wp_params(weights, "l0", pb.r0, c)
                w1, o1, _ = _wp_params(weights, "l1", pb.r1, c)
                outs.append(bi_w(puts[0], puts[1], bit_depth, dn,
                                 w0, w1, o0, o1))
            else:
                outs.append(bi(puts[0], puts[1], bit_depth))
        else:
            if weights is not None:
                lx, ridx = lists[0]
                wx, ox, dn = _wp_params(weights, lx, ridx, c)
                outs.append(uni_w(puts[0], bit_depth, dn, wx, ox))
            else:
                outs.append(uni(puts[0], bit_depth))
    return outs
