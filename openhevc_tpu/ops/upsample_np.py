"""SHVC inter-layer upsampling — numpy reference (SHM resampler).

Behavior parity: upsample_base_layer_frame (hevcdsp_template.c:2164):
separable 8-tap luma / 4-tap chroma with a 16-phase LUT, replicate border
padding, 14-bit horizontal intermediate, (20-8)-shift vertical stage with
rounding+clip. The x2/x1.5 fast paths in the reference use subsets of the
same 16-phase tables, so this general path covers all ratios identically.

Scale/add derivation (hevc.c:475-485):
  scale = ((BL << 16) + (EL >> 1)) // EL ;  add = ((phase*scale + 2) >> 2) + (1 << 11)
"""
from __future__ import annotations

import numpy as np

UP_FILTER_LUMA = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [0, 1, -3, 63, 4, -2, 1, 0],
    [-1, 2, -5, 62, 8, -3, 1, 0],
    [-1, 3, -8, 60, 13, -4, 1, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 52, 26, -8, 3, -1],
    [-1, 3, -9, 47, 31, -10, 4, -1],
    [-1, 4, -11, 45, 34, -10, 4, -1],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [-1, 4, -10, 34, 45, -11, 4, -1],
    [-1, 4, -10, 31, 47, -9, 3, -1],
    [-1, 3, -8, 26, 52, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
    [0, 1, -4, 13, 60, -8, 3, -1],
    [0, 1, -3, 8, 62, -5, 2, -1],
    [0, 1, -2, 4, 63, -3, 1, 0]], np.int64)

UP_FILTER_CHROMA = np.array([
    [0, 64, 0, 0],
    [-2, 62, 4, 0],
    [-2, 58, 10, -2],
    [-4, 56, 14, -2],
    [-4, 54, 16, -2],
    [-6, 52, 20, -2],
    [-6, 46, 28, -4],
    [-4, 42, 30, -4],
    [-4, 36, 36, -4],
    [-4, 30, 42, -4],
    [-4, 28, 46, -6],
    [-2, 20, 52, -6],
    [-2, 16, 54, -4],
    [-2, 14, 56, -4],
    [-2, 10, 58, -2],
    [0, 4, 62, -2]], np.int64)


def scale_add(bl: int, el: int, phase: int = 0):
    scale = ((bl << 16) + (el >> 1)) // el
    add = ((phase * scale + 2) >> 2) + (1 << 11)
    return scale, add


def upsample_plane(bl: np.ndarray, el_w: int, el_h: int,
                   scale_x: int, add_x: int, scale_y: int, add_y: int,
                   bit_depth: int = 8, luma: bool = True,
                   win=(0, 0, 0, 0), off16_y: int = 0) -> np.ndarray:
    """Upsample one BL plane to (el_h, el_w). win = (left, right, top,
    bottom) scaled-reference-layer offsets in this plane's units."""
    filt = UP_FILTER_LUMA if luma else UP_FILTER_CHROMA
    ntaps = filt.shape[1]
    half = (ntaps >> 1) - 1
    h_bl, w_bl = bl.shape
    left, right, top, bottom = win
    right_end = el_w - right
    bottom_end = el_h - bottom
    src = bl.astype(np.int64)
    # horizontal pass -> temp [h_bl, el_w]
    temp = np.zeros((h_bl, el_w), np.int64)
    for i in range(el_w):
        x = min(max(i, left), right_end)
        ref16 = ((x - left) * scale_x + add_x) >> 12
        phase = ref16 & 15
        refpos = (ref16 >> 4) - half
        cols = np.clip(np.arange(refpos, refpos + ntaps), 0, w_bl - 1)
        temp[:, i] = src[:, cols] @ filt[phase]
    # vertical pass -> out [el_h, el_w]
    out = np.zeros((el_h, el_w), np.int64)
    nshift = 20 - 8
    offset = 1 << (nshift - 1)
    maxv = (1 << bit_depth) - 1
    # vertical stage source columns: the reference walks a pointer that
    # advances only for left <= i <= right_end-2, i.e. clip(i, ...)
    col_map = np.clip(np.arange(el_w), left, right_end - 1)
    for j in range(el_h):
        y = min(max(j, top), bottom_end - 1)
        ref16 = (((y - top) * scale_y + add_y) >> 12) + off16_y
        phase = ref16 & 15
        refpos = (ref16 >> 4) - half
        rows = np.clip(np.arange(refpos, refpos + ntaps), 0, h_bl - 1)
        acc = filt[phase] @ temp[rows][:, col_map]
        out[j] = np.clip((acc + offset) >> nshift, 0, maxv)
    return out


def upsample_frame(bl_planes, el_w: int, el_h: int, bit_depth: int = 8,
                   phase_align: int = 0):
    """Upsample [Y, Cb, Cr] 4:2:0 BL planes to EL size (zero window)."""
    bl_h, bl_w = bl_planes[0].shape
    sx, ax = scale_add(bl_w, el_w)
    sy, ay = scale_add(bl_h, el_h)
    y = upsample_plane(bl_planes[0], el_w, el_h, sx, ax, sy, ay,
                       bit_depth, luma=True)
    # chroma: same scale as luma (computed on luma dims, hevc.c:487);
    # vertical phase offset 1 (+phase_align) per the addYCr derivation
    axc = ((phase_align * sx + 2) >> 2) + (1 << 11)
    ayc = (((1 + phase_align) * sy + 2) >> 2) + (1 << 11)
    cb = upsample_plane(bl_planes[1], el_w >> 1, el_h >> 1, sx, axc, sy, ayc,
                        bit_depth, luma=False)
    cr = upsample_plane(bl_planes[2], el_w >> 1, el_h >> 1, sx, axc, sy, ayc,
                        bit_depth, luma=False)
    return [y, cb, cr]


def upsample_il_frame(planes, el_w: int, el_h: int, bit_depth: int = 8,
                      hs: int = 1, vs: int = 1):
    """Upsample a decoded BL frame [Y, Cb, Cr] to EL dimensions — the
    inter-layer reference picture (hevc.c:473-487 scale/phase rules:
    chroma reuses the luma-derived scales; vertical chroma phase is 1
    with cross_layer_phase_alignment_flag == 0)."""
    y = np.asarray(planes[0])
    bl_h, bl_w = y.shape
    sx, ax = scale_add(bl_w, el_w)
    sy, ay = scale_add(bl_h, el_h)
    out = [upsample_plane(y, el_w, el_h, sx, ax, sy, ay,
                          bit_depth=bit_depth, luma=True)]
    axc = ((0 * sx + 2) >> 2) + (1 << 11)
    ayc = ((1 * sy + 2) >> 2) + (1 << 11)
    for c in (1, 2):
        # vertical chroma has a -4/16 position offset after the shift
        # (hevcdsp_template.c chroma pass: refPos16 = (...>>12) - 4)
        out.append(upsample_plane(np.asarray(planes[c]),
                                  el_w >> hs, el_h >> vs, sx, axc, sy, ayc,
                                  bit_depth=bit_depth, luma=False,
                                  off16_y=-4))
    return out


def upscale_mv_field(bl_motion, bl_w, bl_h, el_w, el_h, grid_h4, grid_w4,
                     nb_list):
    """Inter-layer motion field mapping (ff_upscale_mv_block,
    hevc_filter.c:1311, whole-frame): per 16x16 EL block, sample the BL
    motion at the center-mapped 16-aligned position; SNR copies the
    MvField, spatial scales MVs by ScalingFactor = ((EL<<8)+(BL>>1))//BL
    per axis (clip +-4096 then +-32768 on the product>>8). nb_list: 1
    for P EL slices (the reference then scales list 0 only but still
    copies the full pred_flag — reproduced). Returns (pred_flag4, mv4,
    refpoc4) grids of [grid_h4, grid_w4] shape."""
    pf_b = np.asarray(bl_motion[0])
    mv_b = np.asarray(bl_motion[1], np.int64)
    poc_b = np.asarray(bl_motion[2])
    scale_x = ((bl_w << 16) + (el_w >> 1)) // el_w
    scale_y = ((bl_h << 16) + (el_h >> 1)) // el_h
    sf_x = int(np.clip(((el_w << 8) + (bl_w >> 1)) // bl_w, -4096, 4095))
    sf_y = int(np.clip(((el_h << 8) + (bl_h >> 1)) // bl_h, -4096, 4095))
    snr = scale_x == 65536 and scale_y == 65536
    # vectorized over the 16x16 EL block grid
    x_el = np.arange(0, el_w, 16)
    y_el = np.arange(0, el_h, 16)
    x_bl = ((np.minimum(x_el + 8, el_w - 1) * scale_x + (1 << 15))
            >> 16) + 4
    y_bl = ((np.minimum(y_el + 8, el_h - 1) * scale_y + (1 << 15))
            >> 16) + 4
    valid = (y_bl[:, None] < bl_h) & (x_bl[None, :] < bl_w)
    b4y = np.minimum((y_bl >> 4) << 2, pf_b.shape[0] - 1)
    b4x = np.minimum((x_bl >> 4) << 2, pf_b.shape[1] - 1)
    pfb = np.where(valid, pf_b[b4y[:, None], b4x[None, :]], 0)
    mvb = mv_b[b4y[:, None], b4x[None, :]]        # [ny, nx, 2, 2]
    pocb = poc_b[b4y[:, None], b4x[None, :]]      # [ny, nx, 2]
    if snr:
        mv_blk = mvb.astype(np.int32)
        poc_blk = pocb
    else:
        p = mvb * np.array([sf_x, sf_y], np.int64)     # per-axis product
        mv_blk = np.clip((p + 127 + (p < 0)) >> 8,
                         -32768, 32767).astype(np.int32)
        if nb_list < 2:
            mv_blk[:, :, 1] = 0
        poc_blk = pocb.copy()
        if nb_list < 2:
            poc_blk[:, :, 1] = 0
    live = pfb != 0
    mv_blk = np.where(live[..., None, None], mv_blk, 0)
    poc_blk = np.where(live[..., None], poc_blk, 0)
    rep = lambda a: np.repeat(np.repeat(a, 4, 0), 4, 1)  # noqa: E731
    pf = np.zeros((grid_h4, grid_w4), np.uint8)
    mv = np.zeros((grid_h4, grid_w4, 2, 2), np.int32)
    poc = np.zeros((grid_h4, grid_w4, 2), np.int32)
    h = min(grid_h4, pfb.shape[0] * 4)
    w = min(grid_w4, pfb.shape[1] * 4)
    pf[:h, :w] = rep(pfb.astype(np.uint8))[:h, :w]
    mv[:h, :w] = rep(mv_blk)[:h, :w]
    poc[:h, :w] = rep(poc_blk)[:h, :w]
    return pf, mv, poc
