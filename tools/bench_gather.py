#!/usr/bin/env python3
"""Microbench MC stage-2 gather formulations on the TPU.

Shapes mirror ra_main 1080p luma: hf [R=4, P=4, Hp, wn] int16,
per-pixel (slot, fx, fy, sx, sy) from a realistic motion grid."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

R, P, taps = 4, 4, 8
H, W = 1080, 1920
PAD = 8
Hp, wn = H + 2 * PAD, W + 2 * PAD - taps + 1

rng = np.random.default_rng(0)
hf = jnp.asarray(rng.integers(-1000, 1000, (R, P, Hp, wn), np.int16))
h4, w4 = H // 4, W // 4
mv4 = rng.integers(-64, 64, (h4, w4, 2)).astype(np.int16)
slot4 = rng.integers(0, R, (h4, w4)).astype(np.uint8)
mv4_d = jnp.asarray(mv4)
slot4_d = jnp.asarray(slot4)
filt = jnp.asarray(rng.integers(-10, 60, (4, taps), np.int32))


def timeit(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        r = f(*a)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@jax.jit
def v0_per_pixel(hf, mv4, slot4):
    mv4 = mv4.astype(jnp.int32)
    center = 3
    mvx = jnp.repeat(jnp.repeat(mv4[:, :, 0], 4, 0), 4, 1)
    mvy = jnp.repeat(jnp.repeat(mv4[:, :, 1], 4, 0), 4, 1)
    slot = jnp.repeat(jnp.repeat(slot4.astype(jnp.int32), 4, 0), 4, 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sx = xs + (mvx >> 2)
    sy = ys + (mvy >> 2)
    fx = mvx & 3
    fy = mvy & 3
    hn = Hp - taps + 1
    gi = jnp.clip(sx + PAD - center, 0, wn - 1)
    gj = jnp.clip(sy + PAD - center, 0, hn - 1)
    flat = hf.reshape(R * P, Hp, wn)
    lin = slot * P + fx
    acc = jnp.zeros((H, W), jnp.int32)
    for j in range(taps):
        rows = flat[lin, gj + j, gi].astype(jnp.int32)
        acc = acc + rows * filt[:, j][fy]
    return acc >> 6


@jax.jit
def v1_linear(hf, mv4, slot4):
    mv4 = mv4.astype(jnp.int32)
    center = 3
    mvx = jnp.repeat(jnp.repeat(mv4[:, :, 0], 4, 0), 4, 1)
    mvy = jnp.repeat(jnp.repeat(mv4[:, :, 1], 4, 0), 4, 1)
    slot = jnp.repeat(jnp.repeat(slot4.astype(jnp.int32), 4, 0), 4, 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sx = xs + (mvx >> 2)
    sy = ys + (mvy >> 2)
    fx = mvx & 3
    fy = mvy & 3
    hn = Hp - taps + 1
    gi = jnp.clip(sx + PAD - center, 0, wn - 1)
    gj = jnp.clip(sy + PAD - center, 0, hn - 1)
    flat = hf.reshape(-1)
    base = ((slot * P + fx) * Hp + gj) * wn + gi
    acc = jnp.zeros((H, W), jnp.int32)
    for j in range(taps):
        rows = flat[base + j * wn].astype(jnp.int32)
        acc = acc + rows * filt[:, j][fy]
    return acc >> 6


@jax.jit
def v2_window(hf, mv4, slot4):
    """Block-granular window gather: one lax.gather pulling a
    [taps+3, 4] patch per 4x4 block, then dense shifted-slice conv."""
    mv4 = mv4.astype(jnp.int32)
    center = 3
    N = h4 * w4
    mvx = mv4[:, :, 0].reshape(N)
    mvy = mv4[:, :, 1].reshape(N)
    slot = slot4.astype(jnp.int32).reshape(N)
    by = (jax.lax.broadcasted_iota(jnp.int32, (h4, w4), 0) * 4).reshape(N)
    bx = (jax.lax.broadcasted_iota(jnp.int32, (h4, w4), 1) * 4).reshape(N)
    sx0 = bx + (mvx >> 2) + PAD - center
    sy0 = by + (mvy >> 2) + PAD - center
    fx = mvx & 3
    fy = mvy & 3
    # NOTE: correctness at frame edges needs the extended-pad trick;
    # for the PERF microbench plain clamps are fine
    sx0 = jnp.clip(sx0, 0, wn - 4)
    sy0 = jnp.clip(sy0, 0, Hp - (taps + 3))
    flat = hf.reshape(R * P, Hp, wn)
    idx = jnp.stack([slot * P + fx, sy0, sx0], axis=1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    patches = jax.lax.gather(flat, idx, dnums,
                             slice_sizes=(1, taps + 3, 4),
                             mode="clip")          # [N, taps+3, 4]
    patches = patches.astype(jnp.int32)
    w = filt[fy]                                    # [N, taps]
    acc = jnp.zeros((N, 4, 4), jnp.int32)
    for t in range(taps):
        acc = acc + patches[:, t:t + 4, :] * w[:, t, None, None]
    out = (acc >> 6).reshape(h4, w4, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(H, W)
    return out


print("v0 per-pixel:", round(timeit(v0_per_pixel, hf, mv4_d, slot4_d), 1),
      "ms")
print("v1 linear  :", round(timeit(v1_linear, hf, mv4_d, slot4_d), 1),
      "ms")
print("v2 window  :", round(timeit(v2_window, hf, mv4_d, slot4_d), 1),
      "ms")
# cross-check v2 vs v0 away from edges (interior blocks)
a = np.asarray(v0_per_pixel(hf, mv4_d, slot4_d))
c = np.asarray(v2_window(hf, mv4_d, slot4_d))
inner = np.s_[100:-100, 100:-100]
print("v2 == v0 (interior):", np.array_equal(a[inner], c[inner]))


@jax.jit
def v3_vf(hf, mv4, slot4):
    """Dense all-phase vertical filtering (VPU) + ONE linearized
    gather per pixel."""
    mv4 = mv4.astype(jnp.int32)
    center = 3
    hn = Hp - taps + 1
    # vf[R, Py, P, hn, wn] int16: vertical filter at every y-phase
    flat = hf.astype(jnp.int32)                       # [R, P, Hp, wn]
    vf = []
    for py in range(4):
        acc = jnp.zeros((R, P, hn, wn), jnp.int32)
        for t in range(taps):
            acc = acc + flat[:, :, t:t + hn, :] * filt[py, t]
        vf.append((acc >> 6).astype(jnp.int16))
    vf = jnp.stack(vf, axis=1)                        # [R, 4, P, hn, wn]
    vflat = vf.reshape(-1)
    mvx = jnp.repeat(jnp.repeat(mv4[:, :, 0], 4, 0), 4, 1)
    mvy = jnp.repeat(jnp.repeat(mv4[:, :, 1], 4, 0), 4, 1)
    slot = jnp.repeat(jnp.repeat(slot4.astype(jnp.int32), 4, 0), 4, 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    sx = xs + (mvx >> 2)
    sy = ys + (mvy >> 2)
    fx = mvx & 3
    fy = mvy & 3
    gi = jnp.clip(sx + PAD - center, 0, wn - 1)
    gj = jnp.clip(sy + PAD - center, 0, hn - 1)
    idx = (((slot * 4 + fy) * P + fx) * hn + gj) * wn + gi
    return vflat[idx].astype(jnp.int32)


print("v3 vf+1gather:", round(timeit(v3_vf, hf, mv4_d, slot4_d), 1), "ms")
c = np.asarray(v3_vf(hf, mv4_d, slot4_d))
print("v3 == v0:", np.array_equal(a, c))
