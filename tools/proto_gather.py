"""Prototype benchmarks for the round-5 device-kernel redesign:
  1. MC stage-2: per-pixel gather vs 4x4-patch lax.gather (+ remap)
  2. residual payload: per-byte gather vs 8-byte-chunk row gather
  3. motion grid rebuild: jnp.cumsum vs triangular-matmul prefix sum
Run on the real TPU: python tools/proto_gather.py
"""
import sys
import os
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, n=5):
    r = fn(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


H, W = 1080, 1920
h4, w4 = H // 4, W // 4
R, Py, Px = 4, 4, 4
hn, wn = H + 9, W + 9
rng = np.random.default_rng(0)

pp = jnp.asarray(rng.integers(-1000, 1000, (R, Py, Px, hn, wn), np.int16))
mv4 = jnp.asarray(rng.integers(-64, 64, (h4, w4, 2), np.int32))
slot4 = jnp.asarray(rng.integers(0, R, (h4, w4), np.int32))
jax.block_until_ready((pp, mv4, slot4))


@jax.jit
def pixel_gather(pp, mv4, slot4):
    mvx = jnp.repeat(jnp.repeat(mv4[:, :, 0], 4, 0), 4, 1)
    mvy = jnp.repeat(jnp.repeat(mv4[:, :, 1], 4, 0), 4, 1)
    slot = jnp.repeat(jnp.repeat(slot4, 4, 0), 4, 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sx = xs + (mvx >> 2)
    sy = ys + (mvy >> 2)
    fx = mvx & 3
    fy = mvy & 3
    gi = jnp.clip(sx + 5, 0, wn - 1)
    gj = jnp.clip(sy + 5, 0, hn - 1)
    idx = (((slot * Py + fy) * Px + fx) * hn + gj) * wn + gi
    return pp.reshape(-1)[idx].astype(jnp.int32)


@jax.jit
def patch_gather(pp, mv4, slot4):
    fx = mv4[:, :, 0] & 3
    fy = mv4[:, :, 1] & 3
    vx = 4 * jnp.arange(w4)[None, :] + (mv4[:, :, 0] >> 2) + 5
    vy = 4 * jnp.arange(h4)[:, None] + (mv4[:, :, 1] >> 2) + 5
    bx = jnp.clip(vx, 0, wn - 4)
    by = jnp.clip(vy, 0, hn - 4)
    starts = jnp.stack([slot4.reshape(-1), fy.reshape(-1), fx.reshape(-1),
                        by.reshape(-1), bx.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0, 1, 2),
        start_index_map=(0, 1, 2, 3, 4))
    patch = jax.lax.gather(pp, starts, dn, (1, 1, 1, 4, 4),
                           mode=jax.lax.GatherScatterMode.CLIP)
    patch = patch.astype(jnp.int32)          # [N, 4, 4]
    # in-patch clamp remap (block-clamped start vs per-pixel clamp)
    d = jnp.arange(4)
    ry = (jnp.clip(vy.reshape(-1)[:, None] + d[None, :], 0, hn - 1) -
          by.reshape(-1)[:, None])           # [N, 4] values 0..3
    rx = (jnp.clip(vx.reshape(-1)[:, None] + d[None, :], 0, wn - 1) -
          bx.reshape(-1)[:, None])
    # select rows: out[n, dy, :] = patch[n, ry[n, dy], :]
    def sel4(p, r):
        # p [N,4,4] select along axis 1 by r [N,4]
        r_ = r[:, :, None]
        return jnp.where(r_ == 0, p[:, 0:1, :],
               jnp.where(r_ == 1, p[:, 1:2, :],
               jnp.where(r_ == 2, p[:, 2:3, :], p[:, 3:4, :])))
    p2 = sel4(patch, ry)
    p3 = sel4(p2.transpose(0, 2, 1), rx).transpose(0, 2, 1)
    return p3.reshape(h4, w4, 4, 4).transpose(0, 2, 1, 3).reshape(H, W)


print("MC pixel gather:", round(t(pixel_gather, pp, mv4, slot4), 1), "ms")
print("MC patch gather:", round(t(patch_gather, pp, mv4, slot4), 1), "ms")
a = pixel_gather(pp, mv4, slot4)
b = patch_gather(pp, mv4, slot4)
print("bit-exact:", bool(jnp.array_equal(a, b)))

# ---- residual payload gather ------------------------------------------
cap, ss = 4096, 256          # 16x16 bucket
PAY = 1 << 20
pay = jnp.asarray(rng.integers(0, 255, PAY, np.uint8))
offs = jnp.asarray(np.sort(rng.integers(0, PAY - ss, cap)).astype(np.int32))
jax.block_until_ready((pay, offs))


@jax.jit
def byte_gather(pay, offs):
    k = jnp.arange(ss)[None, :]
    return pay[offs[:, None] + (k >> 1)].astype(jnp.int32)


@jax.jit
def chunk_gather(pay, offs):
    rows = pay.reshape(-1, 8)
    ridx = (offs[:, None] >> 3) + jnp.arange(ss // 16)[None, :]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(0,), start_index_map=(0,))
    ch = jax.lax.gather(rows, ridx[:, :, None], dn, (1, 8),
                        mode=jax.lax.GatherScatterMode.CLIP)
    return ch.astype(jnp.int32)              # [cap, ss/16, 8]


print("res byte gather [cap,ss]:", round(t(byte_gather, pay, offs), 1), "ms")
print("res chunk gather [cap,ss/16,8]:",
      round(t(chunk_gather, pay, offs), 1), "ms")

# ---- motion cumsum ----------------------------------------------------
G = jnp.asarray(rng.integers(-3, 3, (7, h4, w4), np.int32))
jax.block_until_ready(G)


@jax.jit
def cumsum2(G):
    G = jnp.cumsum(G, axis=1)
    return jnp.cumsum(G, axis=2)


@jax.jit
def trimat(G):
    ty = jnp.tril(jnp.ones((h4, h4), jnp.int32))
    tx = jnp.triu(jnp.ones((w4, w4), jnp.int32))
    Gf = G.astype(jnp.float32)
    out = jnp.einsum("yh,chw->cyw", ty.astype(jnp.float32), Gf)
    out = jnp.einsum("chw,wx->chx", out, tx.astype(jnp.float32))
    return out.astype(jnp.int32)


print("motion cumsum:", round(t(cumsum2, G), 1), "ms")
print("motion tri-matmul:", round(t(trimat, G), 1), "ms")
print("cumsum bit-exact:", bool(jnp.array_equal(cumsum2(G), trimat(G))))
