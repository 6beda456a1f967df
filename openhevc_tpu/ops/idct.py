"""Residual assembly on device: dequant + inverse transforms as batched
matrix math over TU size buckets, scattered into per-plane residual images.

TPU mapping: the two IDCT stages are constant-matrix matmuls -> MXU. All
arithmetic is int32 with the exact clipping of the scalar reference
(ops/transforms_np.py; parity hevcdsp_template.c). TUs of one size are
s-aligned so the scatter is block-granular.

The fully-parallel structure (no dependency between TUs) is why this whole
stage is one fused XLA program per size bucket.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .transforms_np import DCT, DST4, LEVEL_SCALE

_LEVEL_SCALE = jnp.asarray(np.asarray(LEVEL_SCALE, np.int32))


def _clip16(x):
    return jnp.clip(x, -32768, 32767)


def _immul(a, b_f32):
    """Exact int16-range x int8-range matmul on the MXU.

    a: int32 [M, K] with |a| < 2^15; b_f32: f32 [K, N] holding integers
    |b| < 2^7 (the DCT/DST coefficients). a splits into a signed high byte
    and unsigned low byte; each side's products are <= 2^15 so they are
    exact in the MXU's bf16 multipliers, and the f32 accumulation of at
    most 32 terms stays below 2^24 -> bit-exact int32 result."""
    lo = jnp.dot((a & 255).astype(jnp.float32), b_f32,
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    hi = jnp.dot((a >> 8).astype(jnp.float32), b_f32,
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    return lo + (hi << 8)


@partial(jax.jit, static_argnames=("s", "bit_depth"))
def residual_bucket(levels, qp, is_dst, tskip, bypass, rdpcm_vert, has_rdpcm,
                    s: int, bit_depth: int, sm=None):
    """levels: int32 [N, s, s] raw; returns residual int32 [N, s, s].

    qp [N] int32; flags [N] bool. has_rdpcm: [N] bool (apply cumsum).
    sm: optional int32 [N, s, s] (or [1, s, s]) scaling matrices
    (scale_m of hevc_cabac.c:1827; None = flat 16).

    Dequant is restructured to stay int32-exact: the qp//6 left shift is
    folded into the bd_shift right shift (exact for the reference's
    round-to-nearest since the rounding bit vanishes when qp//6 >=
    bd_shift), so the widest intermediate is |level|*m*72 < 2^31."""
    log2s = int(np.log2(s))
    bd_shift = bit_depth + log2s - 5
    lv = levels.astype(jnp.int32)
    lvm = lv * 16 if sm is None else lv * sm
    # level_scale[qp%6] as a select chain: XLA gather ops degrade this
    # runtime's dispatch path (~23 ms/call tail afterwards), so no
    # table[idx] anywhere on the device path
    m6 = qp % 6
    ls = jnp.int32(LEVEL_SCALE[5])
    for i in range(5):
        ls = jnp.where(m6 == i, jnp.int32(LEVEL_SCALE[i]), ls)
    prod = lvm * ls[:, None, None]
    e = (bd_shift - qp // 6)[:, None, None]
    rnd = jnp.where(e > 0, 1 << jnp.maximum(e - 1, 0), 0)
    # e<=0: result is prod << -e then int16-clipped; any |prod| >= 2^15
    # saturates regardless, so pre-clip to 2^20 keeps the int32 shift
    # (-e <= div6_max - 5 <= 5) overflow-free without changing the output
    d = jnp.where(e > 0,
                  (prod + rnd) >> jnp.maximum(e, 0),
                  jnp.clip(prod, -(1 << 20), 1 << 20)
                  << jnp.maximum(-e, 0))
    d = _clip16(d)
    # --- full inverse transform path ---------------------------------------
    # Both stages are expressed as right-multiplications by the 128x128
    # block-diagonal kron(I_G, M) with G = 128//s blocks per group, so the
    # MXU contraction depth is always 128 (a flat [n*s, s] x [s, s] matmul
    # uses s/128 of the systolic array; this formulation uses all of it).
    # DCT:  t = M^T d  -> r = t M     <=>  both stages right-mult by M on
    # the per-stage transposed layout;  DST4: both stages by M^T.
    n = levels.shape[0]
    shift2 = 20 - bit_depth
    G = 128 // s
    npad_ = -(-n // G) * G
    dp = jnp.pad(d, ((0, npad_ - n), (0, 0), (0, 0)))
    nG = npad_ // G

    def _kron(m):
        return np.kron(np.eye(G, dtype=np.float32),
                       np.asarray(m, np.float32))

    def _two_stage(bd_f32):
        # rows (g, c) x cols (b, k): XT[(g,c),(b,k)] = d[gG+b, k, c]
        xt = dp.reshape(nG, G, s, s).transpose(0, 3, 1, 2) \
               .reshape(nG * s, G * s)
        t1 = _clip16((_immul(xt, bd_f32) + 64) >> 7)     # rows (g,c), (b,i)
        # rearrange to rows (g, i) x cols (b, c) for the second contraction
        x2 = t1.reshape(nG, s, G, s).transpose(0, 3, 2, 1) \
               .reshape(nG * s, G * s)
        r2 = _clip16((_immul(x2, bd_f32) + (1 << (shift2 - 1))) >> shift2)
        return r2.reshape(nG, s, G, s).transpose(0, 2, 1, 3) \
                 .reshape(npad_, s, s)[:n]

    r_full = _two_stage(jnp.asarray(_kron(DCT[s])))
    if s == 4:
        r_dst = _two_stage(jnp.asarray(_kron(DST4.T)))
        r_full = jnp.where(is_dst[:, None, None], r_dst, r_full)
    # --- transform-skip path (hevcdsp_template.c:139 behavior) ---
    ts_shift = 15 - bit_depth - log2s
    if ts_shift > 0:
        r_ts = (d + (1 << (ts_shift - 1))) >> ts_shift
    else:
        r_ts = d << -ts_shift
    # --- bypass path: raw levels ---
    r = jnp.where(bypass[:, None, None], lv,
                  jnp.where(tskip[:, None, None], r_ts, r_full))
    # rdpcm accumulation (bypass or transform-skip blocks only)
    r_v = jnp.cumsum(r, axis=1, dtype=jnp.int32)
    r_h = jnp.cumsum(r, axis=2, dtype=jnp.int32)
    r_dpcm = jnp.where(rdpcm_vert[:, None, None], r_v, r_h)
    r = jnp.where(has_rdpcm[:, None, None], r_dpcm, r)
    return r


@partial(jax.jit, static_argnames=("s",), donate_argnums=(0,))
def scatter_blocks(res_planes, r, plane_idx, bx, by, s: int):
    """res_planes: int32 [4, Hp, Wp] (plane 3 = trash for padding).
    r: [N, s, s]; plane_idx/bx/by: [N] (block coords in units of s)."""
    n = r.shape[0]
    ar = jnp.arange(s)
    ys = by[:, None, None] * s + ar[None, :, None]
    xs = bx[:, None, None] * s + ar[None, None, :]
    pi = plane_idx[:, None, None] * jnp.ones((n, s, s), jnp.int32)
    return res_planes.at[pi, ys, xs].add(r, mode="drop")


@partial(jax.jit, static_argnames=("s",), donate_argnums=(0,))
def scatter_blocks_abs(buf, r, xs, ys, s: int):
    """buf: int32 [Hp, Wp]; r [N,s,s]; xs/ys absolute pixel coords."""
    ar = jnp.arange(s)
    yy = ys[:, None, None] + ar[None, :, None]
    xx = xs[:, None, None] + ar[None, None, :]
    return buf.at[yy, xx].add(r, mode="drop")


@partial(jax.jit, static_argnames=("s",), donate_argnums=(0,))
def scatter_blocks_abs2(buf, r, pi, xs, ys, s: int):
    """buf: int32 [2, Hp, Wp] (chroma pair); pi in {0,1}."""
    n = r.shape[0]
    ar = jnp.arange(s)
    yy = ys[:, None, None] + ar[None, :, None]
    xx = xs[:, None, None] + ar[None, None, :]
    pb = pi[:, None, None] * jnp.ones((n, s, s), jnp.int32)
    return buf.at[pb, yy, xx].add(r, mode="drop")
