"""Sample-adaptive offset — numpy reference (H.265 8.7.3; behavior parity:
sao_filter_CTB / sao_band_filter / sao_edge_filter,
hevc_filter.c:197 / hevcdsp_template.c:340-511).

Whole-frame formulation: SAO reads the fully deblocked frame and writes a
separate output, so CTB processing order is irrelevant (the reference's
CTB-copy machinery exists only to emulate this within an in-place frame).
"""
from __future__ import annotations

import numpy as np

from ..symbols import FrameSymbols

# eo class -> (neighbor a, neighbor b) offsets (dx, dy)
EO_NEIGHBORS = {
    0: ((-1, 0), (1, 0)),
    1: ((0, -1), (0, 1)),
    2: ((-1, -1), (1, 1)),
    3: ((1, -1), (-1, 1)),
}
# edgeIdx (2 + sign + sign) -> offset slot (0 = unchanged)
EDGE_IDX_MAP = (1, 2, 0, 3, 4)


def sao(planes_in, fs: FrameSymbols, chroma_vstage=None):
    """planes_in: deblocked [Y, Cb, Cr]. Returns SAO-filtered planes.

    chroma_vstage: chroma planes after the deblocking *vertical* pass only.
    For 16x16-CTB streams the reference's staggered filter pipeline
    (ff_hevc_hls_filter:1027) SAO-classifies each CTB's bottom-right halo
    column against values whose chroma horizontal deblock chunk is still
    pending (deferred to a later CTB, deblocking_filter_CTB's
    `x_end -= 8*h`); we reproduce that by sourcing those <=2 samples per
    CTB from the vertical-stage planes. CTB 32/64 schedules the chunk
    before SAO, so no patch applies."""
    sps = fs.sps
    if not (fs.sao_luma or fs.sao_chroma):
        return planes_in
    out = [p.copy() for p in planes_in]
    ctb = 1 << sps.log2_ctb
    maxv_l = (1 << sps.bit_depth) - 1
    maxv_c = (1 << sps.bit_depth_chroma) - 1
    for ry in range(sps.ctbs_h):
        for rx in range(sps.ctbs_w):
            for c_idx in range(3):
                if c_idx == 0 and not fs.sao_luma:
                    continue
                if c_idx > 0 and not fs.sao_chroma:
                    continue
                params = fs.sao[ry, rx, c_idx]
                t = int(params[0])
                if t == 0:
                    continue
                hs = sps.hshift1 if c_idx else 0
                vs = sps.vshift1 if c_idx else 0
                pl_in = planes_in[c_idx]
                pl_out = out[c_idx]
                H, W = pl_in.shape
                x0 = (rx * ctb) >> hs
                y0 = (ry * ctb) >> vs
                x1 = min(((rx + 1) * ctb) >> hs, W)
                y1 = min(((ry + 1) * ctb) >> vs, H)
                maxv = maxv_l if c_idx == 0 else maxv_c
                offs = params[2:6].astype(np.int64)
                if t == 1:  # band
                    band_pos = int(params[1])
                    table = np.zeros(32, np.int64)
                    for k in range(4):
                        table[(band_pos + k) & 31] = offs[k]
                    blk = pl_in[y0:y1, x0:x1].astype(np.int64)
                    shift = (sps.bit_depth if c_idx == 0 else
                             sps.bit_depth_chroma) - 5
                    band = blk >> shift
                    pl_out[y0:y1, x0:x1] = np.clip(blk + table[band],
                                                   0, maxv)
                else:  # edge
                    eo = int(params[1])
                    (ax, ay), (bx, by) = EO_NEIGHBORS[eo]
                    # valid sample region: neighbors must be inside picture
                    sx0 = max(x0, -min(ax, bx, 0))
                    sy0 = max(y0, -min(ay, by, 0))
                    sx1 = min(x1, W - max(ax, bx, 0))
                    sy1 = min(y1, H - max(ay, by, 0))
                    if sx0 >= sx1 or sy0 >= sy1:
                        continue
                    c = pl_in[sy0:sy1, sx0:sx1].astype(np.int64)
                    a = pl_in[sy0 + ay:sy1 + ay, sx0 + ax:sx1 + ax] \
                        .astype(np.int64)
                    b = pl_in[sy0 + by:sy1 + by, sx0 + bx:sx1 + bx] \
                        .astype(np.int64)
                    if (c_idx > 0 and chroma_vstage is not None and
                            sps.log2_ctb == 4 and x1 + 8 < W):
                        # halo chunk is deferred only when a CTB exists to
                        # its right (x_end2 == width keeps it local)
                        vst = chroma_vstage[c_idx - 1]
                        stale = [(y1 - 1, x1)]
                        if y1 < H:
                            stale.append((y1, x1))
                        for (py, px) in stale:
                            for arr, (dx, dy) in ((a, (ax, ay)),
                                                  (b, (bx, by))):
                                i = py - dy - sy0
                                j = px - dx - sx0
                                if 0 <= i < arr.shape[0] and \
                                        0 <= j < arr.shape[1]:
                                    arr[i, j] = vst[py, px]
                    idx = 2 + np.sign(c - a) + np.sign(c - b)
                    table = np.zeros(5, np.int64)
                    for k in range(5):
                        slot = EDGE_IDX_MAP[k]
                        table[k] = 0 if slot == 0 else offs[slot - 1]
                    pl_out[sy0:sy1, sx0:sx1] = np.clip(
                        c + table[idx.astype(np.int64)], 0, maxv)
    # restore PCM / transquant-bypass samples (restore_tqb_pixels behavior)
    _restore_nofilter(out, planes_in, fs)
    return out


def _restore_nofilter(out, pre, fs: FrameSymbols):
    sps, pps = fs.sps, fs.pps
    pcmf = (sps.pcm_enabled and sps.pcm_loop_filter_disabled) or \
        pps.transquant_bypass_enabled
    if not pcmf:
        return
    mask4 = (fs.is_pcm.astype(bool) &
             bool(sps.pcm_enabled and sps.pcm_loop_filter_disabled)) | \
        fs.tqb.astype(bool)
    ys, xs = np.nonzero(mask4)
    for y4, x4 in zip(ys, xs):
        out[0][y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4] = \
            pre[0][y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4]
    # chroma at 2x2 granularity per 4x4 luma block (4:2:0)
    for y4, x4 in zip(ys, xs):
        cy, cx = y4 * 2, x4 * 2
        for c in (1, 2):
            out[c][cy:cy + 2, cx:cx + 2] = pre[c][cy:cy + 2, cx:cx + 2]
