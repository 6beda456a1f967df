"""Bit-exact HEVC intra prediction — numpy reference (H.265 8.4.4.2).

Parity target: behavior of hevcpred_template.c (intra_pred :30, pred_planar
:359, pred_dc :388, pred_angular :419). Shared by the test-stream encoder
(closed-loop recon) and the numpy recon oracle; the TPU path (ops/intra.py)
is tested bit-exact against this.

Reference-sample layout used throughout: a single int array `ref` of length
4*s+1 indexed bottom-left -> corner -> top-right:
  ref[i], i in 0..2s-1   : left column p[-1][2s-1-i]  (bottom to top)
  ref[2s]                : corner p[-1][-1]
  ref[2s+1+j], j=0..2s-1 : top row p[j][-1]
"""
from __future__ import annotations

import numpy as np

INTRA_PLANAR = 0
INTRA_DC = 1
INTRA_ANGULAR_HOR = 10
INTRA_ANGULAR_VER = 26

# intraPredAngle for modes 2..34 (Table 8-4)
ANGLES = (32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26,
          -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26, 32)
# invAngle for negative angles (Table 8-5), keyed by angle
INV_ANGLE = {-2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
             -21: -390, -26: -315, -32: -256}


def gather_refs(plane: np.ndarray, x: int, y: int, s: int) -> np.ndarray:
    """Gather the 4s+1 neighbor samples from the (partial) recon plane,
    clamping reads to the plane (values at unavailable positions are
    ignored by substitution)."""
    h, w = plane.shape
    n = 4 * s + 1
    ref = np.zeros(n, dtype=np.int64)
    for i in range(2 * s):
        yy = min(y + 2 * s - 1 - i, h - 1)
        ref[i] = plane[yy, x - 1] if x > 0 else 0
    ref[2 * s] = plane[y - 1, x - 1] if (x > 0 and y > 0) else 0
    for j in range(2 * s):
        xx = min(x + j, w - 1)
        ref[2 * s + 1 + j] = plane[y - 1, xx] if y > 0 else 0
    return ref


def substitute_refs(ref: np.ndarray, avail: np.ndarray, s: int,
                    bit_depth: int) -> np.ndarray:
    """8.4.4.2.2 reference sample substitution. avail: bool[4s+1] in the
    same layout as ref."""
    n = 4 * s + 1
    out = ref.copy()
    if not avail.any():
        out[:] = 1 << (bit_depth - 1)
        return out
    if not avail[0]:
        # find first available in search order and copy backwards
        idx = int(np.argmax(avail))
        out[0] = ref[idx]
    for i in range(1, n):
        if not avail[i]:
            out[i] = out[i - 1]
    return out


def filter_refs(ref: np.ndarray, s: int, mode: int, bit_depth: int,
                strong_smoothing: bool) -> np.ndarray:
    """8.4.4.2.3 filtering of neighbouring samples (luma only)."""
    if mode == INTRA_DC or s == 4:
        return ref
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thres = {8: 7, 16: 1, 32: 0}[s]
    if min_dist <= thres:
        return ref
    n = 4 * s + 1
    corner = 2 * s
    if (s == 32 and strong_smoothing
            and abs(ref[corner] + ref[n - 1] - 2 * ref[corner + s]) < (1 << (bit_depth - 5))
            and abs(ref[corner] + ref[0] - 2 * ref[s]) < (1 << (bit_depth - 5))):
        out = ref.copy()
        # bilinear: top: pF[x][-1] = ((63-x)*corner + (x+1)*p[63][-1] + 32)>>6
        for xx in range(2 * s - 1):
            out[corner + 1 + xx] = ((63 - xx) * ref[corner] +
                                    (xx + 1) * ref[n - 1] + 32) >> 6
        # left: pF[-1][y] = ((63-y)*corner + (y+1)*p[-1][63] + 32)>>6
        for yy in range(2 * s - 1):
            out[corner - 1 - yy] = ((63 - yy) * ref[corner] +
                                    (yy + 1) * ref[0] + 32) >> 6
        return out
    out = ref.copy()
    # [1,2,1]/4 along the whole ref array; endpoints unfiltered
    out[1:n - 1] = (ref[0:n - 2] + 2 * ref[1:n - 1] + ref[2:n] + 2) >> 2
    out[corner] = (ref[corner - 1] + 2 * ref[corner] + ref[corner + 1] + 2) >> 2
    return out


def _left_top(ref: np.ndarray, s: int):
    """left[y]=p[-1][y] y=0..2s-1, top[x]=p[x][-1] x=0..2s-1, corner."""
    left = ref[:2 * s][::-1]
    corner = ref[2 * s]
    top = ref[2 * s + 1:]
    return left, corner, top


def predict(ref: np.ndarray, s: int, mode: int, is_luma: bool,
            bit_depth: int, disable_edge_filters: bool = False) -> np.ndarray:
    maxv = (1 << bit_depth) - 1
    left, corner, top = _left_top(ref, s)
    if mode == INTRA_PLANAR:
        xg, yg = np.meshgrid(np.arange(s), np.arange(s))
        pr = ((s - 1 - xg) * left[yg] + (xg + 1) * top[s] +
              (s - 1 - yg) * top[xg] + (yg + 1) * left[s] + s) >> (s.bit_length())
        return pr.astype(np.int64)
    if mode == INTRA_DC:
        dc = (int(top[:s].sum() + left[:s].sum()) + s) >> (s.bit_length())
        pr = np.full((s, s), dc, dtype=np.int64)
        if is_luma and s < 32 and not disable_edge_filters:
            pr[0, 0] = (left[0] + 2 * dc + top[0] + 2) >> 2
            pr[0, 1:] = (top[1:s] + 3 * dc + 2) >> 2
            pr[1:, 0] = (left[1:s] + 3 * dc + 2) >> 2
        return pr
    angle = ANGLES[mode - 2]
    pr = np.zeros((s, s), dtype=np.int64)
    if mode >= 18:
        # vertical family: main ref = top row
        r = np.zeros(3 * s + 2, dtype=np.int64)  # index offset s: r[s+i]="ref[i]"; +1 pad for fact==0 reads
        r[s] = corner
        r[s + 1:s + 1 + 2 * s] = top[:2 * s]
        if angle < 0:
            inv = INV_ANGLE[angle]
            lim = (s * angle) >> 5
            for i in range(-1, lim - 1, -1):
                # indices can exceed 2s-1 for x in (lim, -1] that prediction
                # never reads (e.g. angle -2, x=-1 -> 15); clamp is safe
                r[s + i] = left[min(2 * s - 1, -1 + ((i * inv + 128) >> 8))]
        for yy in range(s):
            idx = ((yy + 1) * angle) >> 5
            fact = ((yy + 1) * angle) & 31
            for xx in range(s):
                pr[yy, xx] = ((32 - fact) * r[s + xx + idx + 1] +
                              fact * r[s + xx + idx + 2] + 16) >> 5
        if mode == 26 and is_luma and s < 32 and not disable_edge_filters:
            col = top[0] + ((left[:s] - corner) >> 1)
            pr[:, 0] = np.clip(col, 0, maxv)
    else:
        # horizontal family: main ref = left column
        r = np.zeros(3 * s + 2, dtype=np.int64)
        r[s] = corner
        r[s + 1:s + 1 + 2 * s] = left[:2 * s]
        if angle < 0:
            inv = INV_ANGLE[angle]
            lim = (s * angle) >> 5
            for i in range(-1, lim - 1, -1):
                r[s + i] = top[min(2 * s - 1, -1 + ((i * inv + 128) >> 8))]
        for xx in range(s):
            idx = ((xx + 1) * angle) >> 5
            fact = ((xx + 1) * angle) & 31
            for yy in range(s):
                pr[yy, xx] = ((32 - fact) * r[s + yy + idx + 1] +
                              fact * r[s + yy + idx + 2] + 16) >> 5
        if mode == 10 and is_luma and s < 32 and not disable_edge_filters:
            row = left[0] + ((top[:s] - corner) >> 1)
            pr[0, :] = np.clip(row, 0, maxv)
    return pr


def intra_predict_block(plane: np.ndarray, x: int, y: int, s: int, mode: int,
                        avail: np.ndarray, is_luma: bool, bit_depth: int,
                        filter_enabled: bool,
                        strong_smoothing: bool = False) -> np.ndarray:
    """Full intra prediction for one TU from the current recon plane."""
    ref = gather_refs(plane, x, y, s)
    ref = substitute_refs(ref, avail, s, bit_depth)
    if filter_enabled:
        ref = filter_refs(ref, s, mode, bit_depth, strong_smoothing)
    return predict(ref, s, mode, is_luma, bit_depth)
