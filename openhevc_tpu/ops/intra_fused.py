"""Fused intra reconstruction: ONE Pallas kernel per frame runs every
intra TU job in decode order on the TPU core.

Why: the intra wavefront is a serial dependency chain of ~10k tiny TU
jobs per frame.  Dispatching per wavefront level (ops/intra.py) costs a
host->device round trip per level (~0.2 ms each, ~1600 levels x sizes per
832x480 frame).  Here the whole chain executes inside a single kernel:
the reconstructed planes live in VMEM, a fori_loop walks the job list,
and each job reads its neighbour samples, predicts, adds the residual
and writes back -- no dispatch, no wavefront packing.

Parity: bit-exact vs ops/intra_np.py (itself parity-tested against
hevcpred_template.c: intra_pred :30, pred_planar :359, pred_dc :388,
pred_angular :419; substitution 8.4.4.2.2, filtering 8.4.4.2.3).

TPU mapping notes (Mosaic constraints drive the design):
  - dynamic vector loads/stores need sublane offsets %8 and lane offsets
    %128 -> every access is an aligned [hW, 256] window; the job block is
    brought to the window origin with dynamic lane/sublane rolls
    (pltpu.roll), and written back by rolling the blended window back.
  - no gather/scatter -> all gathers are one-hot f32 matmuls on the MXU
    (exact for pixel-range ints) and the per-row angular shift r[x+iidx(y)]
    is 7 conditional whole-matrix rolls over the bits of iidx+32.
  - no cummax/rev -> log-step roll+max scans and constant reversal
    permutation matmuls.
  - reference-sample availability ships as 2 packed 16-bit group words
    per job (availability is constant over 4-sample runs: the spec's
    min-PU granularity).

Buffers are padded: origin (OY, OX) = (8, 128), bottom pad 48 rows,
right pad to lane-tile + 256 so every window read/write is in bounds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intra_np import ANGLES, INV_ANGLE

OY, OX = 8, 128
BOT, RIGHT = 48, 256
HW_OF_S = {4: 16, 8: 24, 16: 40, 32: 72}     # ref window rows (>= 2s+8, %8)
RW_OF_S = {4: 16, 8: 16, 16: 24, 32: 40}     # residual window rows (>= s+8)

_ANG = np.zeros(35, np.int32)
_ANG[2:] = ANGLES
_INV = np.zeros(35, np.int32)
for _m in range(2, 35):
    _INV[_m] = INV_ANGLE.get(ANGLES[_m - 2], 0)


def padded_dims(h: int, w: int) -> tuple[int, int]:
    hp = (OY + h + BOT + 7) & ~7
    wp = OX + ((w + 127) & ~127) + RIGHT
    return hp, wp


# =========================================================================
# Banded variant: frame buffers live in HBM; the kernel slides a
# CTB-row band (plus an 8-row halo above and a window-overrun pad below)
# through VMEM scratch via async DMA.  This removes the whole-frame VMEM
# gate so 1080p / 4K frames run through the single fused dispatch.
# Jobs are host-sorted by band (stable: decode order within a band is
# preserved; intra dependencies never cross a band downward because top
# reference samples come only from row y-1).
# =========================================================================

SCR_PAD = 64                 # rows below the band for window overrun
VMEM_SCRATCH_BUDGET = 9 * 2 ** 20


def band_plan(H, W, Hc, Wc, cs, vs):
    """Choose the band height (a multiple of the CTB size) so the VMEM
    scratch (recon+residual luma & chroma bands) fits the budget.
    Returns (band_h, nbands, hl, wl, hc, wc) or None if even a 1-CTB-row
    band exceeds the budget."""
    wl = OX + ((W + 127) & ~127) + RIGHT
    wc = OX + ((Wc + 127) & ~127) + RIGHT

    def scratch_bytes(bh):
        srl = 8 + bh + SCR_PAD
        src = 8 + (bh >> vs) + SCR_PAD
        return 4 * 2 * (srl * wl + 2 * src * wc)

    m = 1
    while m * cs < H and \
            scratch_bytes((m + 1) * cs) <= VMEM_SCRATCH_BUDGET:
        m += 1
    band_h = m * cs
    if scratch_bytes(band_h) > VMEM_SCRATCH_BUDGET:
        return None
    nb = -(-H // band_h)
    hl = (OY + nb * band_h + SCR_PAD + 7) & ~7
    hc = (OY + nb * (band_h >> vs) + SCR_PAD + 7) & ~7
    return band_h, nb, hl, wl, hc, wc


def sort_meta_by_band(meta8: np.ndarray, n: int, band_h: int, vs: int,
                      nb: int):
    """Stable-sort job columns by band index; returns (meta8 sorted,
    bounds[nb+1] int32 job-range starts per band). meta8 row 0 is the
    buffer y (frame y + OY); the plane rides in the packed row 2
    (pack_meta layout). Stable order keeps decode
    order within a band, which preserves every intra dependency: top
    reference samples come only from row y-1 (at most one band up), and
    with tiles a band's cross-tile job interleaving is dependency-free
    (prediction never crosses tile boundaries)."""
    if n == 0:
        return meta8, np.zeros(nb + 1, np.int32)
    y = meta8[0, :n].astype(np.int32) - OY
    plane = (meta8[2, :n] >> 2) & 3
    bh_c = band_h >> vs
    band = np.where(plane == 0, y // band_h, y // bh_c)
    order = np.argsort(band, kind="stable")
    sorted_meta = meta8.copy()
    sorted_meta[:, :n] = meta8[:, :n][:, order]
    bounds = np.searchsorted(band[order], np.arange(nb + 1)).astype(np.int32)
    return sorted_meta, bounds


# =========================================================================
# Host-side packing: decode-order job meta, shipped TRANSPOSED as
# [5, Npad] int16 (10 B/job on the wire — the wire is the bottleneck;
# the derived rows — do_filter, angle, inv_angle, strong_allowed,
# any_avail, edge_filters — are pure functions of mode/size/plane
# rebuilt on device in models/pipeline.py::_frame_fused, which hands
# the kernel its full [16, Npad] layout). Kernel fields:
#   0 y(buf) 1 x(buf) 2 size_log2-2 3 mode 4 plane 5 do_filter
#   6 avail word0 (groups 0..15) 7 avail word1 (16..31) 13 avail bit 32
#   8 angle 9 inv_angle 10 strong_allowed 11 any_avail 12 edge_filters
# Uploaded rows: 0 y 1 x
#   2 size_log2-2 | plane<<2 | mode<<4 | av_hi<<10   3 av_w0 4 av_w1
# =========================================================================

def pack_meta(planes, xs, ys, szs, modes, avail_rows) -> np.ndarray:
    """avail_rows: uint8/bool [N, >=4*max_s+1] in intra_np spec layout."""
    n = len(planes)
    meta = np.zeros((n, 5), np.int64)
    meta[:, 0] = ys + OY
    meta[:, 1] = xs + OX
    packed = (np.log2(szs).astype(np.int64) - 2) | (planes << 2) | \
        (modes.astype(np.int64) << 4)
    for s in (4, 8, 16, 32):
        sel = np.nonzero(szs == s)[0]
        if not len(sel):
            continue
        av = avail_rows[sel, :4 * s + 1] != 0
        # group bits: availability is uniform over 4-sample runs along each
        # edge (min-PU granularity); group g covers spec positions
        # [left 4g..4g+3 | corner | top 4g'..4g'+3]
        left_g = av[:, :2 * s].reshape(len(sel), s // 2, 4)[:, :, 0]
        corner_g = av[:, 2 * s:2 * s + 1]
        top_g = av[:, 2 * s + 1:4 * s + 1].reshape(
            len(sel), s // 2, 4)[:, :, 0]
        gb = np.concatenate([left_g, corner_g, top_g], axis=1)  # [n, s+1]
        g = gb.shape[1]
        sh = np.arange(min(g, 16), dtype=np.int64)
        meta[sel, 3] = (gb[:, :16].astype(np.int64) << sh[:gb[:, :16].shape[1]]).sum(1)
        if g > 16:
            sh2 = np.arange(g - 16, dtype=np.int64)
            w1 = (gb[:, 16:].astype(np.int64) << sh2).sum(1)
            meta[sel, 4] = w1 & 0xFFFF
            packed[sel] |= ((w1 >> 16) & 1) << 10
    meta[:, 2] = packed
    # shipped int16; the 17-bit avail word rides as two words + the hi
    # bit folded into the packed row, everything else fits: coords
    # < 2^14, modes tiny. Reassembled in _derive_meta16 on device.
    return np.ascontiguousarray(meta.T.astype(np.int16))


def pack_meta_native(raw: dict) -> np.ndarray:
    im = raw["ij_meta"]
    if not len(im):
        return np.zeros((5, 0), np.int16)
    return pack_meta(im[:, 0], im[:, 1], im[:, 2], im[:, 3], im[:, 4],
                     raw["ij_avail"])


def pack_meta_objects(jobs) -> np.ndarray:
    if not jobs:
        return np.zeros((5, 0), np.int16)
    n = len(jobs)
    planes = np.array([j.plane for j in jobs], np.int32)
    xs = np.array([j.x for j in jobs], np.int32)
    ys = np.array([j.y for j in jobs], np.int32)
    szs = np.array([j.size for j in jobs], np.int32)
    modes = np.array([j.mode for j in jobs], np.int32)
    av = np.zeros((n, 132), np.uint8)
    for i, j in enumerate(jobs):
        av[i, :len(j.avail)] = j.avail
    return pack_meta(planes, xs, ys, szs, modes, av)


# =========================================================================
# Kernel
# =========================================================================

def _mm_mk(bd: int):
    """Exact small one-hot/permutation gather as an MXU matmul.  The MXU
    multiplies in bf16 (8-bit mantissa), so pixel values > 255 are split
    into hi/lo bytes and recombined (each side exact in bf16)."""
    if bd <= 8:
        def _mm(a_i32, b_f32):
            return jnp.dot(a_i32.astype(jnp.float32), b_f32,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
    else:
        def _mm(a_i32, b_f32):
            lo = jnp.dot((a_i32 & 255).astype(jnp.float32), b_f32,
                         preferred_element_type=jnp.float32).astype(jnp.int32)
            hi = jnp.dot((a_i32 >> 8).astype(jnp.float32), b_f32,
                         preferred_element_type=jnp.float32).astype(jnp.int32)
            return lo + (hi << 8)
    return _mm


def _rev(k: int):
    """Reversal permutation [k,k] f32, built from iotas (Pallas kernels
    cannot capture trace-time constant arrays)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (j == k - 1 - i).astype(jnp.float32)


def _job(s, bd, buf, res, m):
    """Process one intra TU of size s on plane buffer `buf` (+residual
    `res`).  m: [16,1] int32 meta column."""
    hW, rW = HW_OF_S[s], RW_OF_S[s]
    n_ref = 4 * s + 1
    LV = 256 if 4 * s + 4 > 128 else 128       # gapped sample vector lanes
    LC = 256 if n_ref > 128 else 128           # contiguous ref lanes
    log2s = int(np.log2(s))
    maxv = (1 << bd) - 1
    mid = 1 << (bd - 1)

    _mm = _mm_mk(bd)
    y, x = m[0, 0], m[1, 0]
    mode = m[3, 0]
    do_filter = m[5, 0]
    w0 = m[6, 0] & 0xFFFF
    w1 = (m[7, 0] & 0xFFFF) | (m[13, 0] << 16)
    angle, inv = m[8, 0], m[9, 0]
    strong_allowed = m[10, 0]
    any_avail = m[11, 0]
    edge_f = m[12, 0]

    yb = pl.multiple_of(((y - 1) >> 3) << 3, 8)
    xb = pl.multiple_of(((x - 1) >> 7) << 7, 128)
    dy = (y - 1) - yb
    dx = (x - 1) - xb
    win = buf[pl.ds(yb, hW), pl.ds(xb, 256)]
    win0 = pltpu.roll(pltpu.roll(win, (hW - dy) % hW, 0),
                      (256 - dx) % 256, 1)

    topc = win0[0:1, 0:2 * s + 1]                  # [1, 2s+1] corner+top
    leftc = win0[1:2 * s + 1, 0:1]                 # [2s, 1] top->bottom
    leftT = jnp.transpose(leftc, (1, 0))           # [1, 2s]
    left_spec = _mm(leftT, _rev(2 * s))            # bottom->top (spec order)

    # gapped sample vector: [left 2s | corner x4 | top 2s] -> group = p//4
    sv = jnp.concatenate(
        [left_spec, topc[:, 0:1], jnp.zeros((1, 3), jnp.int32),
         topc[:, 1:2 * s + 1]], axis=1)            # [1, 4s+4]
    sv = jnp.pad(sv, ((0, 0), (0, LV - (4 * s + 4))))

    # ---- substitution (8.4.4.2.2) at 4-sample-group granularity ----------
    G = s + 1
    li = jax.lax.broadcasted_iota(jnp.int32, (1, LV), 1)
    gidx = li >> 2
    g0 = jnp.minimum(gidx, 15)
    g1 = jnp.clip(gidx - 16, 0, 16)
    bit = jnp.where(gidx < 16, w0 >> g0, w1 >> g1) & 1
    in_rng = li < 4 * s + 4
    avail_s = (bit > 0) & in_rng                    # per (gapped) sample

    gi = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    gg0 = jnp.minimum(gi, 15)
    gg1 = jnp.clip(gi - 16, 0, 16)
    ga = (jnp.where(gi < 16, w0 >> gg0, w1 >> gg1) & 1) * (gi < G)

    # last/first sample (in spec scan order) of each 4-sample group:
    # lastpos[g] = 4g+3 (edge groups), 4g (corner group); firstpos[g] = 4g
    pi_ = jax.lax.broadcasted_iota(jnp.int32, (LV, 64), 0)
    gj_ = jax.lax.broadcasted_iota(jnp.int32, (LV, 64), 1)
    lastpos = jnp.where(gj_ == s // 2, 4 * gj_, 4 * gj_ + 3)
    e_last = (pi_ == lastpos).astype(jnp.float32)
    e_first = (pi_ == 4 * gj_).astype(jnp.float32)
    lastvals = _mm(sv, e_last)                      # [1, 64]
    firstvals = _mm(sv, e_first)                    # [1, 64]
    vv = jnp.where(ga > 0, gi, -1)
    for sh in (1, 2, 4, 8, 16, 32):
        r = pltpu.roll(vv, sh, 1)
        vv = jnp.maximum(vv, jnp.where(gi >= sh, r, -1))
    ff = vv                                        # fill-source group or -1
    kk = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
    oneh = (kk == jnp.broadcast_to(ff, (64, 64))).astype(jnp.float32)
    gsub = _mm(lastvals, oneh)                     # lastvals[ff[g]]
    # first-available fallback (positions before the first available)
    pv = ga
    for sh in (1, 2, 4, 8, 16, 32):
        r = pltpu.roll(pv, sh, 1)
        pv = pv | jnp.where(gi >= sh, r, 0)
    prev = pltpu.roll(pv, 1, 1)
    prev = jnp.where(gi >= 1, prev, 0)
    isf = ga * (1 - prev)
    fv = jnp.sum(firstvals * isf)
    gfill = jnp.where(ff >= 0, gsub, fv)
    # expand group values to samples: exp[p] = gfill[p//4] (one-hot matmul;
    # pltpu.repeat tiles rather than interleaves, so it can't be used here)
    ge = (jax.lax.broadcasted_iota(jnp.int32, (64, LV), 0) ==
          (jax.lax.broadcasted_iota(jnp.int32, (64, LV), 1) >> 2)
          ).astype(jnp.float32)
    exp = _mm(gfill, ge)                           # [1, LV]
    svs = jnp.where(avail_s, sv, exp)
    svs = jnp.where(any_avail > 0, svs, mid)

    # compact to contiguous spec layout [left 2s | corner | top 2s]
    ref = jnp.concatenate([svs[:, 0:2 * s + 1], svs[:, 2 * s + 4:4 * s + 4]],
                          axis=1)
    ref = jnp.pad(ref, ((0, 0), (0, LC - n_ref)))
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, LC), 1)

    # ---- neighbour filtering (8.4.4.2.3) ----------------------------------
    if s > 4:
        up = pltpu.roll(ref, 1, 1)
        dn = pltpu.roll(ref, LC - 1, 1)
        f121 = (up + 2 * ref + dn + 2) >> 2
        f121 = jnp.where((ci >= 1) & (ci <= 4 * s - 1), f121, ref)
        if s == 32:
            c = ref[0, 2 * s]
            r0 = ref[0, 0]
            rn = ref[0, 4 * s]
            tmid = ref[0, 3 * s]
            lmid = ref[0, s]
            th = 1 << (bd - 5)
            scond = ((jnp.abs(c + rn - 2 * tmid) < th) &
                     (jnp.abs(c + r0 - 2 * lmid) < th) &
                     (strong_allowed > 0))
            # top positions p=2s+1..4s-1: xx=p-2s-1
            xx = ci - (2 * s + 1)
            top_bl = ((63 - xx) * c + (xx + 1) * rn + 32) >> 6
            # left positions p=1..2s-1: yy=2s-1-p
            yy = 2 * s - 1 - ci
            left_bl = ((63 - yy) * c + (yy + 1) * r0 + 32) >> 6
            fstr = jnp.where((ci >= 2 * s + 1) & (ci <= 4 * s - 1),
                             top_bl, ref)
            fstr = jnp.where((ci >= 1) & (ci <= 2 * s - 1), left_bl, fstr)
            f121 = jnp.where(scond, fstr, f121)
        ref = jnp.where(do_filter > 0, f121, ref)

    # ---- derive edges ------------------------------------------------------
    left_tb = _mm(ref[:, 0:2 * s], _rev(2 * s))       # left top->bottom
    top_lr = ref[:, 2 * s + 1:4 * s + 1]              # [1, 2s]
    corner = ref[0, 2 * s]
    t_x = top_lr[:, 0:s]                              # [1, s]
    l_col = jnp.transpose(left_tb[:, 0:s], (1, 0))    # [s, 1]
    xg = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    yg = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)

    def fam_planar():
        ts = top_lr[0, s]
        ls = left_tb[0, s]
        return ((s - 1 - xg) * l_col + (xg + 1) * ts +
                (s - 1 - yg) * t_x + (yg + 1) * ls + s) >> (log2s + 1)

    def fam_dc():
        dc = (jnp.sum(t_x) + jnp.sum(left_tb[:, 0:s]) + s) >> (log2s + 1)
        pr = jnp.broadcast_to(dc, (s, s))
        if s < 32:
            row0 = (t_x + 3 * dc + 2) >> 2            # [1, s]
            col0 = (l_col + 3 * dc + 2) >> 2          # [s, 1]
            c00 = (left_tb[0, 0] + 2 * dc + top_lr[0, 0] + 2) >> 2
            pe = jnp.where(yg == 0, row0, pr)
            pe = jnp.where(xg == 0, col0, pe)
            pe = jnp.where((xg == 0) & (yg == 0), c00, pe)
            pr = jnp.where(edge_f > 0, pe, pr)
        return pr

    def fam_angular():
        is_ver = mode >= 18
        main = jnp.where(is_ver, top_lr, left_tb)     # [1, 2s]
        side = jnp.where(is_ver, left_tb, top_lr)
        # negative projection r[s-1-k] = side[clip(-1+((-(k+1))*inv+128)>>8)]
        ks = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
        proj = jnp.clip(-1 + ((-(ks + 1) * inv + 128) >> 8), 0, 2 * s - 1)
        k64 = jax.lax.broadcasted_iota(jnp.int32, (64, s), 0)
        oneh2 = (k64 == jnp.broadcast_to(proj, (64, s))).astype(jnp.float32)
        side64 = jnp.pad(side, ((0, 0), (0, 64 - 2 * s)))
        r_negk = _mm(side64, oneh2)                   # [1, s]
        r_low = _mm(r_negk, _rev(s))                  # reversed
        l128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        base = jnp.pad(r_low, ((0, 0), (0, 128 - s)))
        base = jnp.where((angle < 0) & (l128 < s), base, 0)
        cvec = jnp.where(l128 == s, corner, 0)
        mvec = pltpu.roll(jnp.pad(main, ((0, 0), (0, 128 - 2 * s))),
                          s + 1, 1)
        mvec = jnp.where((l128 >= s + 1) & (l128 <= 3 * s), mvec, 0)
        r = base + cvec + mvec                        # [1, 128]
        ys1 = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0) + 1
        prod = ys1 * angle
        iidx = prod >> 5
        fact = prod & 31
        mm = jnp.broadcast_to(r, (s, 128))
        mm = pltpu.roll(mm, 32, 1)
        u = iidx + 32                                 # [s,1] in 0..64
        for b in range(7):
            bitb = ((u >> b) & 1) > 0
            mm = jnp.where(bitb, pltpu.roll(mm, 128 - (1 << b), 1), mm)
        rv1 = mm[:, s + 1:2 * s + 1]
        rv2 = pltpu.roll(mm, 127, 1)[:, s + 1:2 * s + 1]
        prm = ((32 - fact) * rv1 + fact * rv2 + 16) >> 5
        pr = jax.lax.cond(is_ver, lambda: prm,
                          lambda: jnp.transpose(prm, (1, 0)))
        if s < 32:
            col = jnp.clip(top_lr[0, 0] + ((l_col - corner) >> 1), 0, maxv)
            row = jnp.clip(left_tb[0, 0] + ((t_x - corner) >> 1), 0, maxv)
            pr = jnp.where((mode == 26) & (edge_f > 0) & (xg == 0), col, pr)
            pr = jnp.where((mode == 10) & (edge_f > 0) & (yg == 0), row, pr)
        return pr

    fam = jnp.where(mode < 2, mode, 2)
    pred = jax.lax.switch(fam, [fam_planar, fam_dc, fam_angular])

    # ---- residual add + write back ----------------------------------------
    yb2 = pl.multiple_of((y >> 3) << 3, 8)
    dy2 = y - yb2
    dx2 = x - xb
    resw = res[pl.ds(yb2, rW), pl.ds(xb, 256)]
    resb = pltpu.roll(pltpu.roll(resw, (rW - dy2) % rW, 0),
                      (256 - dx2) % 256, 1)[0:s, 0:s]
    recon = jnp.clip(pred + resb, 0, maxv)

    canvas = jnp.pad(recon, ((1, hW - s - 1), (1, 255 - s)))
    ri = jax.lax.broadcasted_iota(jnp.int32, (hW, 256), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (hW, 256), 1)
    blk = (ri >= 1) & (ri <= s) & (cj >= 1) & (cj <= s)
    win1 = jnp.where(blk, canvas, win0)
    winw = pltpu.roll(pltpu.roll(win1, dy, 0), dx, 1)
    buf[pl.ds(yb, hW), pl.ds(xb, 256)] = winw
    return 0


@functools.lru_cache(maxsize=None)
def _build(hl, wl, hc, wc, npad, bd):

    def kernel(meta_ref, n_ref_, luma_in, chroma_in, resl, resc,
               luma_out, chroma_out):
        luma_out[...] = luma_in[...]
        chroma_out[...] = chroma_in[...]

        def body(j, _):
            jb = pl.multiple_of((j >> 7) << 7, 128)
            mc = pltpu.roll(meta_ref[:, pl.ds(jb, 128)],
                            (128 - (j - jb)) % 128, 1)
            m = mc[:, 0:1]                    # [16, 1] this job's fields
            sidx = m[2, 0]
            plane = m[4, 0]

            def per_size(s):
                def go():
                    def on_luma():
                        _job(s, bd, luma_out, resl, m)
                        return 0

                    def on_cb():
                        _job(s, bd, chroma_out.at[0], resc.at[0], m)
                        return 0

                    def on_cr():
                        _job(s, bd, chroma_out.at[1], resc.at[1], m)
                        return 0

                    jax.lax.cond(
                        plane == 0, on_luma,
                        lambda: jax.lax.cond(plane == 1, on_cb, on_cr))
                    return 0
                return go

            jax.lax.switch(sidx, [per_size(4), per_size(8), per_size(16),
                                  per_size(32)])
            return 0

        jax.lax.fori_loop(0, n_ref_[0, 0], body, 0)

    fn = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((hl, wl), jnp.int32),
                   jax.ShapeDtypeStruct((2, hc, wc), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_banded(hl, wl, hc, wc, npad, bd, band_h, vs, nbands):
    """Banded fused intra kernel: recon/residual planes live in HBM
    (ANY); a fori over bands DMAs [halo 8 | band | overrun pad] rows into
    VMEM scratch, runs that band's jobs (meta DMA'd in 128-job chunks),
    and DMAs the band rows back.  Bands are sequential — band k+1's halo
    row is band k's freshly written output — so no double buffering is
    needed (the DMA is microseconds against a band's job loop)."""
    srl = 8 + band_h + SCR_PAD               # luma scratch rows
    bh_c = band_h >> vs
    src_rows = 8 + bh_c + SCR_PAD            # chroma scratch rows

    def kernel(meta_hbm, bounds, luma_in, chroma_in, resl_hbm, resc_hbm,
               luma_out, chroma_out,
               sl, sc, srl_s, src_s, smeta, sems):
        del luma_in, chroma_in               # aliased onto the outputs

        def band(k, _):
            start = bounds[k]
            end = bounds[k + 1]

            @pl.when(end > start)
            def _process():
                base_l = k * band_h          # = (OY + k*band_h) - 8
                base_c = k * bh_c
                dmas = [
                    pltpu.make_async_copy(
                        luma_out.at[pl.ds(base_l, srl), :], sl,
                        sems.at[0]),
                    pltpu.make_async_copy(
                        chroma_out.at[0, pl.ds(base_c, src_rows), :],
                        sc.at[0], sems.at[1]),
                    pltpu.make_async_copy(
                        chroma_out.at[1, pl.ds(base_c, src_rows), :],
                        sc.at[1], sems.at[2]),
                    pltpu.make_async_copy(
                        resl_hbm.at[pl.ds(base_l, srl), :], srl_s,
                        sems.at[3]),
                    pltpu.make_async_copy(
                        resc_hbm.at[0, pl.ds(base_c, src_rows), :],
                        src_s.at[0], sems.at[4]),
                    pltpu.make_async_copy(
                        resc_hbm.at[1, pl.ds(base_c, src_rows), :],
                        src_s.at[1], sems.at[5]),
                ]
                for d in dmas:
                    d.start()
                for d in dmas:
                    d.wait()

                def jloop(j, cur_chunk):
                    chunk = j >> 7

                    @pl.when(chunk != cur_chunk)
                    def _load():
                        cp = pltpu.make_async_copy(
                            meta_hbm.at[:, pl.ds(chunk * 128, 128)],
                            smeta, sems.at[6])
                        cp.start()
                        cp.wait()

                    mc = pltpu.roll(smeta[:, :], (128 - (j & 127)) % 128, 1)
                    m = mc[:, 0:1]
                    sidx = m[2, 0]
                    plane = m[4, 0]
                    # band-relative y: scratch row 0 = buffer row
                    # OY + k*band - 8, so y' = y_buf - k*band
                    yoff = jnp.where(plane == 0, k * band_h, k * bh_c)
                    ri = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
                    m = jnp.where(ri == 0, m - yoff, m)

                    def per_size(s):
                        def go():
                            def on_luma():
                                _job(s, bd, sl, srl_s, m)
                                return 0

                            def on_cb():
                                _job(s, bd, sc.at[0], src_s.at[0], m)
                                return 0

                            def on_cr():
                                _job(s, bd, sc.at[1], src_s.at[1], m)
                                return 0

                            jax.lax.cond(
                                plane == 0, on_luma,
                                lambda: jax.lax.cond(plane == 1, on_cb,
                                                     on_cr))
                            return 0
                        return go

                    jax.lax.switch(sidx, [per_size(4), per_size(8),
                                          per_size(16), per_size(32)])
                    return chunk

                jax.lax.fori_loop(start, end, jloop, jnp.int32(-1))

                outs = [
                    pltpu.make_async_copy(
                        sl.at[pl.ds(8, band_h), :],
                        luma_out.at[pl.ds(OY + k * band_h, band_h), :],
                        sems.at[0]),
                    pltpu.make_async_copy(
                        sc.at[0, pl.ds(8, bh_c), :],
                        chroma_out.at[0, pl.ds(OY + k * bh_c, bh_c), :],
                        sems.at[1]),
                    pltpu.make_async_copy(
                        sc.at[1, pl.ds(8, bh_c), :],
                        chroma_out.at[1, pl.ds(OY + k * bh_c, bh_c), :],
                        sems.at[2]),
                ]
                for d in outs:
                    d.start()
                for d in outs:
                    d.wait()

            return 0

        jax.lax.fori_loop(0, nbands, band, 0)

    fn = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((hl, wl), jnp.int32),
                   jax.ShapeDtypeStruct((2, hc, wc), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),     # meta [16,npad]
                  pl.BlockSpec(memory_space=pltpu.SMEM),    # bounds [nb+1]
                  pl.BlockSpec(memory_space=pltpu.ANY),     # luma in
                  pl.BlockSpec(memory_space=pltpu.ANY),     # chroma in
                  pl.BlockSpec(memory_space=pltpu.ANY),     # res luma
                  pl.BlockSpec(memory_space=pltpu.ANY)],    # res chroma
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        input_output_aliases={2: 0, 3: 1},
        scratch_shapes=[
            pltpu.VMEM((srl, wl), jnp.int32),
            pltpu.VMEM((2, src_rows, wc), jnp.int32),
            pltpu.VMEM((srl, wl), jnp.int32),
            pltpu.VMEM((2, src_rows, wc), jnp.int32),
            pltpu.VMEM((16, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((7,)),
        ],
    )
    return jax.jit(fn)


def _bucket(n: int) -> int:
    """1/16-octave meta width bucket (matches models/pipeline._round_fine
    and native round_fine: the meta wire buffer is 10 B/job, so coarse
    pow2 rounding costs ~0.5 MB/frame at 4K)."""
    if n <= 1024:
        return 1024
    step = 1 << max((n - 1).bit_length() - 5, 0)
    return -(-n // step) * step


def intra_reconstruct_fused(luma, chroma, res_l, res_c, meta: np.ndarray,
                            bit_depth: int):
    """luma [Hl,Wl] int32 padded; chroma [2,Hc,Wc]; res same shapes;
    meta [16,N] int32 (decode order).  Returns updated (luma, chroma)."""
    n = meta.shape[1]
    if n == 0:
        return luma, chroma
    npad = _bucket(n)
    if npad != n:
        meta = np.concatenate(
            [meta, np.zeros((16, npad - n), meta.dtype)], axis=1)
    fn = _build(luma.shape[0], luma.shape[1], chroma.shape[1],
                chroma.shape[2], npad, bit_depth)
    nn = jnp.asarray([[n]], jnp.int32)
    return fn(jnp.asarray(meta).astype(jnp.int32), nn, luma, chroma,
              res_l, res_c)
