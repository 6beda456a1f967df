"""Bit-exact integer HEVC inverse transforms + (de)quant — numpy reference.

These are the scalar ground-truth ops (parity: behavior of
hevcdsp_template.c transform family, expressed as matrix math instead of
butterflies — identical outputs). The TPU path (ops/idct.py) runs the same
matrices as batched MXU matmuls and is tested bit-exact against this module.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Transform matrices (normative H.265 8.6.4.1 constants)
# ---------------------------------------------------------------------------

# magnitudes of odd-index basis values per size (first columns of odd rows)
_ODDS = {
    4: (83, 36),
    8: (89, 75, 50, 18),
    16: (90, 87, 80, 70, 57, 43, 25, 9),
    32: (90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4),
}


def _base_vals(n: int) -> list[int]:
    """base[j] = scaled cos(pi*j/(2n)) magnitudes for j in 0..n."""
    if n == 2:
        return [64, 64, 0]
    prev = _base_vals(n // 2)
    out = [0] * (n + 1)
    for j in range(0, n + 1, 2):
        out[j] = prev[j // 2]
    for i, j in enumerate(range(1, n, 2)):
        out[j] = _ODDS[n][i]
    return out


def dct_matrix(n: int) -> np.ndarray:
    """Forward DCT basis matrix M[k][j] (rows = basis vectors), int32."""
    base = _base_vals(n)
    m = np.zeros((n, n), dtype=np.int32)
    for k in range(n):
        for j in range(n):
            a = (k * (2 * j + 1)) % (4 * n)
            if a > 2 * n:
                a = 4 * n - a
            if a > n:
                m[k, j] = -base[2 * n - a]
            else:
                m[k, j] = base[a]
    return m


# inverse-DST stage matrix A (transform_4x4_luma behavior): out = A @ in
DST4 = np.array([[29, 74, 84, 55],
                 [55, 74, -29, -84],
                 [74, 0, -74, 74],
                 [84, -74, 55, -29]], dtype=np.int32)

DCT = {n: dct_matrix(n) for n in (4, 8, 16, 32)}

LEVEL_SCALE = np.array([40, 45, 51, 57, 64, 72], dtype=np.int64)


def clip16(x):
    return np.clip(x, -32768, 32767)


def dequant(levels: np.ndarray, log2_size: int, qp: int, bit_depth: int,
            scaling: np.ndarray | None = None) -> np.ndarray:
    """8.6.3 scaling: raw levels -> dequantized coeffs (int, clipped 16-bit).

    levels: int array [s, s] (raster). scaling: m[u][v] (default flat 16).
    """
    bd_shift = bit_depth + log2_size - 5
    m = 16 if scaling is None else scaling.astype(np.int64)
    lv = levels.astype(np.int64)
    d = (lv * m * int(LEVEL_SCALE[qp % 6]) << (qp // 6))
    d = (d + (1 << (bd_shift - 1))) >> bd_shift
    return clip16(d).astype(np.int32)


def inverse_transform(coeffs: np.ndarray, bit_depth: int,
                      is_dst: bool = False) -> np.ndarray:
    """8.6.4 inverse transform of a dequantized [s,s] block -> residual int.

    Two matmul stages with int16 clipping, matching the reference butterfly
    (hevcdsp_template.c:210-302 / transform_4x4_luma :185)."""
    s = coeffs.shape[0]
    m = DST4 if is_dst else DCT[s]
    c = coeffs.astype(np.int64)
    if is_dst:
        # stage 1 operates along columns: out[:, v] = A @ c[:, v]
        t = m.astype(np.int64) @ c
    else:
        t = m.T.astype(np.int64) @ c
    t = clip16((t + 64) >> 7)
    shift2 = 20 - bit_depth
    if is_dst:
        r = (m.astype(np.int64) @ t.T).T
    else:
        r = t @ m.astype(np.int64)
    r = clip16((r + (1 << (shift2 - 1))) >> shift2)
    return r.astype(np.int32)


def transform_skip(coeffs: np.ndarray, log2_size: int,
                   bit_depth: int) -> np.ndarray:
    """transform_skip residual scaling (hevcdsp_template.c:139 behavior)."""
    shift = 15 - bit_depth - log2_size
    c = coeffs.astype(np.int64)
    if shift > 0:
        r = (c + (1 << (shift - 1))) >> shift
    else:
        r = c << -shift
    return r.astype(np.int32)


def rdpcm(res: np.ndarray, vertical: bool) -> np.ndarray:
    """transform_rdpcm accumulation (hevcdsp_template.c:114)."""
    axis = 0 if vertical else 1
    return np.cumsum(res, axis=axis, dtype=np.int64).astype(np.int32)


# ---------------------------------------------------------------------------
# Forward transforms (encoder side only; any conformant quantizer is valid)
# ---------------------------------------------------------------------------

def forward_transform(res: np.ndarray, bit_depth: int,
                      is_dst: bool = False) -> np.ndarray:
    """HM-style forward core transform: res [s,s] -> coeffs [s,s]."""
    s = res.shape[0]
    m = (DST4 if is_dst else DCT[s]).astype(np.int64)
    shift1 = int(np.log2(s)) + bit_depth - 9
    shift2 = int(np.log2(s)) + 6
    x = res.astype(np.int64)
    if is_dst:
        t = _rshift_round(x @ m.T, shift1)
        c = _rshift_round(m @ t, shift2)
    else:
        t = _rshift_round(x @ m.T, shift1)      # horizontal stage
        c = _rshift_round(m @ t, shift2)        # vertical stage
    return c


def _rshift_round(x: np.ndarray, shift: int) -> np.ndarray:
    if shift <= 0:
        return x << -shift
    return (x + (1 << (shift - 1))) >> shift


def quantize(coeffs: np.ndarray, log2_size: int, qp: int,
             bit_depth: int) -> np.ndarray:
    """Simple RDO-free quantizer (encoder side). Levels clipped to the
    entropy-codable range."""
    f = (26214, 23302, 20560, 18396, 16384, 14564)
    tshift = 15 - bit_depth - log2_size
    qbits = 14 + qp // 6 + tshift
    c = coeffs.astype(np.int64)
    offset = 171 << (qbits - 9)  # ~1/3 rounding (intra-style)
    lv = (np.abs(c) * f[qp % 6] + offset) >> qbits
    lv = np.clip(lv, 0, 32767)
    return (np.sign(c) * lv).astype(np.int32)
