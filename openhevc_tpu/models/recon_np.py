"""Frame reconstruction from FrameSymbols — numpy reference engine.

Bit-exact scalar ground truth for the TPU pipeline (models/pipeline.py):
residual assembly -> PCM placement -> decode-order intra scan -> (inter MC)
-> deblock -> SAO. Used to validate the host parser against the reference
decoder, and each Pallas kernel against this.
"""
from __future__ import annotations

import numpy as np

from ..symbols import FrameSymbols
from ..ops import transforms_np as T
from ..ops import intra_np as I


def residual_planes(fs: FrameSymbols):
    fs.ensure_objects()
    sps = fs.sps
    W, H = sps.width, sps.height
    cw, ch = W >> sps.hshift1, H >> sps.vshift1
    res = [np.zeros((H, W), np.int32),
           np.zeros((ch, cw), np.int32),
           np.zeros((ch, cw), np.int32)]
    bd = sps.bit_depth
    sl = fs.active_scaling()
    luma_res = {}       # (x, y, log2) -> residual (cross-component pred)
    cross_on = bool(getattr(fs.pps, "cross_component_prediction_enabled",
                            0))
    for cb in fs.coeff_blocks:
        s = 1 << cb.log2_size
        # scaling matrix applies except for transform-skip TBs larger
        # than 4x4 (hevc_cabac.c:1484 gate)
        m = None
        if sl is not None and not (cb.transform_skip and cb.log2_size > 2):
            m = sl.matrix(cb.log2_size, cb.matrix_id)
        if cb.transquant_bypass:
            r = cb.levels.astype(np.int32)
            if cb.rdpcm_mode >= 0:
                r = T.rdpcm(r, cb.rdpcm_mode == 1)
        elif cb.transform_skip:
            d = T.dequant(cb.levels, cb.log2_size, cb.qp, bd, scaling=m)
            r = T.transform_skip(d, cb.log2_size, bd)
            if cb.rdpcm_mode >= 0:
                r = T.rdpcm(r, cb.rdpcm_mode == 1)
        else:
            d = T.dequant(cb.levels, cb.log2_size, cb.qp, bd, scaling=m)
            r = T.inverse_transform(d, bd, is_dst=cb.is_dst)
        if cross_on:
            if cb.plane == 0:
                luma_res[(cb.x, cb.y, cb.log2_size)] = r
            elif cb.cross_scale:
                ylr = luma_res.get((cb.x, cb.y, cb.log2_size))
                if ylr is not None:
                    # int16 accumulate like the reference's coeffs buffer
                    r = (r + ((cb.cross_scale * ylr) >> 3)).astype(np.int16)
        res[cb.plane][cb.y:cb.y + s, cb.x:cb.x + s] = r
    return res


def reconstruct(fs: FrameSymbols, ref_planes=None):
    """Returns [Y, Cb, Cr] int32 planes (pre-crop).

    ref_planes: {poc: [Y, Cb, Cr]} decoded reference pictures."""
    ref_planes = ref_planes or {}
    fs.ensure_objects()
    sps = fs.sps
    W, H = sps.width, sps.height
    cw, ch = W >> sps.hshift1, H >> sps.vshift1
    bd = sps.bit_depth
    maxv = (1 << bd) - 1
    planes = [np.zeros((H, W), np.int32),
              np.zeros((ch, cw), np.int32),
              np.zeros((ch, cw), np.int32)]
    res = residual_planes(fs)
    # PCM blocks place directly (pre-filter recon)
    for p in fs.pcm_blocks:
        s = p.size
        planes[0][p.y:p.y + s, p.x:p.x + s] = p.samples_y
        cs_h = s >> sps.hshift1
        cs_v = s >> sps.vshift1
        cy, cx = p.y >> sps.vshift1, p.x >> sps.hshift1
        planes[1][cy:cy + cs_v, cx:cx + cs_h] = p.samples_cb
        planes[2][cy:cy + cs_v, cx:cx + cs_h] = p.samples_cr
    # inter prediction: PUs are independent of current-frame recon
    if fs.inter_pbs:
        from ..ops.mc_np import predict_inter_block
        for pb in fs.inter_pbs:
            l0_planes = ref_planes.get(pb.l0[2]) if pb.l0 else None
            l1_planes = ref_planes.get(pb.l1[2]) if pb.l1 else None
            pred = predict_inter_block(l0_planes, l1_planes, pb, bd,
                                       sps.hshift1, sps.vshift1,
                                       weights=fs.weights)
            x, y, w, h = pb.x, pb.y, pb.w, pb.h
            planes[0][y:y + h, x:x + w] = np.clip(
                pred[0] + res[0][y:y + h, x:x + w], 0, maxv)
            cx, cy = x >> sps.hshift1, y >> sps.vshift1
            cw2, ch2 = w >> sps.hshift1, h >> sps.vshift1
            for c in (1, 2):
                planes[c][cy:cy + ch2, cx:cx + cw2] = np.clip(
                    pred[c] + res[c][cy:cy + ch2, cx:cx + cw2], 0, maxv)
    # decode-order intra scan
    for job in fs.intra_jobs:
        pl = planes[job.plane]
        pred = I.intra_predict_block(
            pl, job.x, job.y, job.size, job.mode, job.avail,
            is_luma=(job.plane == 0), bit_depth=bd,
            filter_enabled=job.filter_refs,
            strong_smoothing=(bool(sps.strong_intra_smoothing)
                              and job.plane == 0))
        r = res[job.plane][job.y:job.y + job.size, job.x:job.x + job.size]
        pl[job.y:job.y + job.size, job.x:job.x + job.size] = \
            np.clip(pred + r, 0, maxv)
    return apply_loop_filters(planes, fs)


def apply_loop_filters(planes, fs: FrameSymbols):
    """Deblocking then SAO, driven on the reference's exact CTB schedule
    (bit-exactness at CTB-halo samples depends on the interleaving —
    see ops/filters_sched.py)."""
    from ..ops.filters_sched import apply_loop_filters as _sched
    return _sched(planes, fs)
