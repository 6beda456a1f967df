"""HEVC deblocking filter — numpy reference (H.265 8.7.2).

Whole-frame formulation: every vertical edge in the picture is filtered
first, then every horizontal edge (the reference's staggered CTB pipeline,
deblocking_filter_CTB hevc_filter.c:345, computes exactly this order).
Bit-exact target for the TPU stencil kernel (ops/deblock.py).
"""
from __future__ import annotations

import numpy as np

from ..symbols import FrameSymbols
from ..bitstream.syntax import chroma_qp

TC_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
    5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24], np.int32)

BETA_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8,
    9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34,
    36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], np.int32)


def boundary_strengths(fs: FrameSymbols):
    """BS per 4-sample edge segment: vbs[H4, W8], hbs[H8, W4].

    Whole-frame equivalent of ff_hevc_deblocking_boundary_strengths
    (hevc_filter.c:805): at TU boundaries -> intra=2 / cbf=1 / MV rule;
    at 8-aligned lines interior to inter TUs -> MV rule only."""
    sps = fs.sps
    h4 = sps.height >> 2
    w4 = sps.width >> 2
    w8 = sps.width >> 3
    h8 = sps.height >> 3
    vbs = np.zeros((h4, w8), np.int32)
    hbs = np.zeros((h8, w4), np.int32)
    pm = fs.pred_mode
    for x8 in range(1, w8):
        x4 = x8 * 2
        for y4 in range(h4):
            vbs[y4, x8] = _edge_bs(fs, pm, x4 - 1, y4, x4, y4,
                                   fs.bounds_v[y4, x4])
    for y8 in range(1, h8):
        y4 = y8 * 2
        for x4 in range(w4):
            hbs[y8, x4] = _edge_bs(fs, pm, x4, y4 - 1, x4, y4,
                                   fs.bounds_h[y4, x4])
    return vbs, hbs


def _edge_bs(fs, pm, px4, py4, qx4, qy4, is_tu_edge):
    if is_tu_edge:
        if pm[qy4, qx4] == 1 or pm[py4, px4] == 1:
            return 2
        if fs.cbf_luma4[py4, px4] or fs.cbf_luma4[qy4, qx4]:
            return 1
        return _mv_bs(fs.motion, px4, py4, qx4, qy4)
    # line interior to a TU: MV rule for inter-inter only
    if pm[qy4, qx4] == 1 or pm[py4, px4] == 1:
        return 0
    return _mv_bs(fs.motion, px4, py4, qx4, qy4)


def _mv_bs(mc, px4, py4, qx4, qy4):
    """MV-difference rule (boundary_strength, hevc_filter.c:584,
    TEST_MV_POC variant)."""
    if mc is None:
        return 0
    PF_BI = 3
    p_pf = int(mc.pred_flag[py4, px4])
    q_pf = int(mc.pred_flag[qy4, qx4])
    p_mv = mc.mv[py4, px4]
    q_mv = mc.mv[qy4, qx4]
    p_poc = mc.refpoc[py4, px4]
    q_poc = mc.refpoc[qy4, qx4]
    if (p_pf == q_pf and np.array_equal(p_mv, q_mv) and
            np.array_equal(p_poc, q_poc) and
            np.array_equal(mc.ref_idx[py4, px4], mc.ref_idx[qy4, qx4])):
        return 0

    def far(a, b):
        return abs(int(a[0]) - int(b[0])) >= 4 or \
            abs(int(a[1]) - int(b[1])) >= 4

    if q_pf == PF_BI and p_pf == PF_BI:
        if (q_poc[0] == p_poc[0] and q_poc[0] == q_poc[1] and
                p_poc[0] == p_poc[1]):
            straight = not far(p_mv[0], q_mv[0]) and not far(p_mv[1], q_mv[1])
            crossed = not far(p_mv[1], q_mv[0]) and not far(p_mv[0], q_mv[1])
            return 0 if (straight or crossed) else 1
        if p_poc[0] == q_poc[0] and p_poc[1] == q_poc[1]:
            return 0 if (not far(p_mv[0], q_mv[0]) and
                         not far(p_mv[1], q_mv[1])) else 1
        if p_poc[1] == q_poc[0] and p_poc[0] == q_poc[1]:
            return 0 if (not far(p_mv[1], q_mv[0]) and
                         not far(p_mv[0], q_mv[1])) else 1
        return 1
    if q_pf != PF_BI and p_pf != PF_BI:
        lq = 0 if (q_pf & 1) else 1
        lp = 0 if (p_pf & 1) else 1
        if q_poc[lq] == p_poc[lp]:
            return 1 if far(q_mv[lq], p_mv[lp]) else 0
        return 1
    return 1


def _no_filter_mask(fs: FrameSymbols):
    sps, pps = fs.sps, fs.pps
    pcmf = (sps.pcm_enabled and sps.pcm_loop_filter_disabled) or \
        pps.transquant_bypass_enabled
    if not pcmf:
        return None
    mask = (fs.is_pcm.astype(bool) &
            bool(sps.pcm_enabled and sps.pcm_loop_filter_disabled)) | \
        fs.tqb.astype(bool)
    return mask  # per 4x4, True = don't modify samples of this block


def deblock(planes, fs: FrameSymbols, return_vstage: bool = False):
    """In-place deblocking of [Y, Cb, Cr] int planes. Returns planes, or
    (planes, chroma_vstage) when return_vstage: chroma planes captured after
    the vertical pass (needed to reproduce the reference's SAO halo timing
    for 16x16 CTBs — see ops/sao_np.py)."""
    if fs.deblock_disabled:
        return (planes, [planes[1], planes[2]]) if return_vstage else planes
    sps = fs.sps
    bd = sps.bit_depth
    vbs, hbs = boundary_strengths(fs)
    nf = _no_filter_mask(fs)
    beta_off, tc_off = fs.beta_offset, fs.tc_offset
    qp4 = fs.qp_y4.astype(np.int32)
    y_plane = planes[0]
    H, W = y_plane.shape

    def get_nf(x4, y4):
        return bool(nf[y4, x4]) if nf is not None else False

    # ---------------- luma vertical edges ----------------
    for x8 in range(1, W >> 3):
        x = x8 * 8
        for y4 in range(H >> 2):
            bs = vbs[y4, x8]
            if not bs:
                continue
            y = y4 * 4
            qp = (int(qp4[y4, (x - 1) >> 2]) + int(qp4[y4, x >> 2]) + 1) >> 1
            beta = int(BETA_TABLE[np.clip(qp + beta_off, 0, 51)]) << (bd - 8)
            tc = int(TC_TABLE[np.clip(qp + 2 * (bs - 1) + tc_off, 0, 53)]) \
                << (bd - 8)
            no_p = get_nf((x - 1) >> 2, y4)
            no_q = get_nf(x >> 2, y4)
            _luma_edge_seg(y_plane, x, y, True, beta, tc, no_p, no_q, bd)
    # ---------------- luma horizontal edges ----------------
    for y8 in range(1, H >> 3):
        y = y8 * 8
        for x4 in range(W >> 2):
            bs = hbs[y8, x4]
            if not bs:
                continue
            x = x4 * 4
            qp = (int(qp4[(y - 1) >> 2, x4]) + int(qp4[y >> 2, x4]) + 1) >> 1
            beta = int(BETA_TABLE[np.clip(qp + beta_off, 0, 51)]) << (bd - 8)
            tc = int(TC_TABLE[np.clip(qp + 2 * (bs - 1) + tc_off, 0, 53)]) \
                << (bd - 8)
            no_p = get_nf(x4, (y - 1) >> 2)
            no_q = get_nf(x4, y >> 2)
            _luma_edge_seg(y_plane, x, y, False, beta, tc, no_p, no_q, bd)
    # ---------------- chroma (4:2:0) ----------------
    chroma_vstage = [planes[1], planes[2]]
    if sps.chroma_format_idc:
        bdc = sps.bit_depth_chroma
        for c_idx in (1, 2):
            pl = planes[c_idx]
            off = fs.pps.cb_qp_offset if c_idx == 1 else fs.pps.cr_qp_offset
            Hc, Wc = pl.shape
            # vertical chroma edges: luma x multiple of 16
            for cx8 in range(1, Wc >> 3):
                x = cx8 * 16          # luma coords
                for cy4 in range(Hc >> 2):
                    ly4 = cy4 * 2     # luma 4x4 row of chroma segment start
                    bs = vbs[ly4 & ~1, x >> 3] if False else vbs[(cy4 * 8) >> 2, x >> 3]
                    if bs != 2:
                        continue
                    qp_l = (int(qp4[(cy4 * 8) >> 2, (x - 1) >> 2]) +
                            int(qp4[(cy4 * 8) >> 2, x >> 2]) + 1) >> 1
                    qpc = chroma_qp(qp_l, off, sps.chroma_format_idc, 0)
                    tc = int(TC_TABLE[np.clip(qpc + 2 + tc_off, 0, 53)]) \
                        << (bdc - 8)
                    no_p = get_nf((x - 1) >> 2, (cy4 * 8) >> 2)
                    no_q = get_nf(x >> 2, (cy4 * 8) >> 2)
                    _chroma_edge_seg(pl, cx8 * 8, cy4 * 4, True, tc,
                                     no_p, no_q, bdc)
            chroma_vstage[c_idx - 1] = pl.copy()
            # horizontal chroma edges: luma y multiple of 16
            for cy8 in range(1, Hc >> 3):
                y = cy8 * 16
                for cx4 in range(Wc >> 2):
                    bs = hbs[y >> 3, (cx4 * 8) >> 2]
                    if bs != 2:
                        continue
                    qp_l = (int(qp4[(y - 1) >> 2, (cx4 * 8) >> 2]) +
                            int(qp4[y >> 2, (cx4 * 8) >> 2]) + 1) >> 1
                    qpc = chroma_qp(qp_l, off, sps.chroma_format_idc, 0)
                    tc = int(TC_TABLE[np.clip(qpc + 2 + tc_off, 0, 53)]) \
                        << (bdc - 8)
                    no_p = get_nf((cx4 * 8) >> 2, (y - 1) >> 2)
                    no_q = get_nf((cx4 * 8) >> 2, y >> 2)
                    _chroma_edge_seg(pl, cx4 * 4, cy8 * 8, False, tc,
                                     no_p, no_q, bdc)
    if return_vstage:
        return planes, chroma_vstage
    return planes


def _luma_edge_seg(pl, x, y, vertical, beta, tc, no_p, no_q, bd):
    """Filter one 4-line luma segment at edge (x,y)."""
    if tc == 0:
        return
    maxv = (1 << bd) - 1

    def P(i, line):  # p_i of given line
        if vertical:
            return int(pl[y + line, x - 1 - i])
        return int(pl[y - 1 - i, x + line])

    def Q(i, line):
        if vertical:
            return int(pl[y + line, x + i])
        return int(pl[y + i, x + line])

    def setP(i, line, v):
        if vertical:
            pl[y + line, x - 1 - i] = v
        else:
            pl[y - 1 - i, x + line] = v

    def setQ(i, line, v):
        if vertical:
            pl[y + line, x + i] = v
        else:
            pl[y + i, x + line] = v

    dp0 = abs(P(2, 0) - 2 * P(1, 0) + P(0, 0))
    dq0 = abs(Q(2, 0) - 2 * Q(1, 0) + Q(0, 0))
    dp3 = abs(P(2, 3) - 2 * P(1, 3) + P(0, 3))
    dq3 = abs(Q(2, 3) - 2 * Q(1, 3) + Q(0, 3))
    d0 = dp0 + dq0
    d3 = dp3 + dq3
    if d0 + d3 >= beta:
        return
    strong = True
    for line, d in ((0, d0), (3, d3)):
        if not (2 * d < (beta >> 2) and
                abs(P(3, line) - P(0, line)) + abs(Q(0, line) - Q(3, line))
                < (beta >> 3) and
                abs(P(0, line) - Q(0, line)) < ((5 * tc + 1) >> 1)):
            strong = False
            break
    if strong:
        for line in range(4):
            p3, p2, p1, p0 = (P(3, line), P(2, line), P(1, line), P(0, line))
            q0, q1, q2, q3 = (Q(0, line), Q(1, line), Q(2, line), Q(3, line))
            if not no_p:
                setP(0, line, np.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4)
                                      >> 3, p0 - 2 * tc, p0 + 2 * tc))
                setP(1, line, np.clip((p2 + p1 + p0 + q0 + 2) >> 2,
                                      p1 - 2 * tc, p1 + 2 * tc))
                setP(2, line, np.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4)
                                      >> 3, p2 - 2 * tc, p2 + 2 * tc))
            if not no_q:
                setQ(0, line, np.clip((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4)
                                      >> 3, q0 - 2 * tc, q0 + 2 * tc))
                setQ(1, line, np.clip((p0 + q0 + q1 + q2 + 2) >> 2,
                                      q1 - 2 * tc, q1 + 2 * tc))
                setQ(2, line, np.clip((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4)
                                      >> 3, q2 - 2 * tc, q2 + 2 * tc))
    else:
        nd_p = dp0 + dp3 < ((beta + (beta >> 1)) >> 3)
        nd_q = dq0 + dq3 < ((beta + (beta >> 1)) >> 3)
        for line in range(4):
            p2, p1, p0 = P(2, line), P(1, line), P(0, line)
            q0, q1, q2 = Q(0, line), Q(1, line), Q(2, line)
            delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
            if abs(delta0) >= 10 * tc:
                continue
            delta = int(np.clip(delta0, -tc, tc))
            if not no_p:
                setP(0, line, np.clip(p0 + delta, 0, maxv))
                if nd_p:
                    dp = int(np.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1,
                                     -(tc >> 1), tc >> 1))
                    setP(1, line, np.clip(p1 + dp, 0, maxv))
            if not no_q:
                setQ(0, line, np.clip(q0 - delta, 0, maxv))
                if nd_q:
                    dq = int(np.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1,
                                     -(tc >> 1), tc >> 1))
                    setQ(1, line, np.clip(q1 + dq, 0, maxv))


def _chroma_edge_seg(pl, cx, cy, vertical, tc, no_p, no_q, bd):
    if tc == 0:
        return
    maxv = (1 << bd) - 1
    for line in range(4):
        if vertical:
            p1, p0 = int(pl[cy + line, cx - 2]), int(pl[cy + line, cx - 1])
            q0, q1 = int(pl[cy + line, cx]), int(pl[cy + line, cx + 1])
        else:
            p1, p0 = int(pl[cy - 2, cx + line]), int(pl[cy - 1, cx + line])
            q0, q1 = int(pl[cy, cx + line]), int(pl[cy + 1, cx + line])
        delta = int(np.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc))
        np0 = np.clip(p0 + delta, 0, maxv)
        nq0 = np.clip(q0 - delta, 0, maxv)
        if vertical:
            if not no_p:
                pl[cy + line, cx - 1] = np0
            if not no_q:
                pl[cy + line, cx] = nq0
        else:
            if not no_p:
                pl[cy - 1, cx + line] = np0
            if not no_q:
                pl[cy, cx + line] = nq0
