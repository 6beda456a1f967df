"""SHVC (scalable HEVC) 2-layer stream generation.

Parameter-set writers mirroring the reference's SHVC parse exactly:
- write_vps_shvc: base VPS (layer sets for {L0}, {L0,L1}) + the VPS
  extension in the field order of parse_vps_extension
  (hevc_ps.c:714-1100): scalability mask, dimension ids, direct
  dependencies, PTL list, output layer sets, rep formats, DPB table,
  dependency types.
- write_sps_el: enhancement-layer SPS — the reference skips
  max_sub_layers/PTL/chroma/size/bit-depth for nuh_layer_id > 0 and
  takes geometry from the VPS rep format (ff_hevc_decode_nal_sps,
  hevc_ps.c:1556-1722).

The EL slice header carries one extra flag (inter_layer_pred_enabled,
hevc.c:808) with NumDirectRefLayers == 1 and
max_one_active_ref_layer_flag == 1; the inter-layer reference is the
upsampled BL picture appended to L0 after ST-before entries
(ff_hevc_slice_rpl cand order, hevc_refs.c:457).
"""
from __future__ import annotations

import numpy as np

from ..bitstream.bits import BitWriter, wrap_nal
from .hevc_enc import (EncoderConfig, _profile_tier_level, _write_st_rps,
                       NAL_VPS, NAL_SPS, NAL_PPS, NAL_IDR_N_LP, NAL_TRAIL_R,
                       write_pps)


def write_vps_shvc(bl: EncoderConfig, el: EncoderConfig) -> bytes:
    bw = BitWriter()
    bw.put(0, 4)            # vps_video_parameter_set_id
    bw.put(3, 2)            # vps_reserved_three_2bits
    bw.put(1, 6)            # vps_max_layers_minus1 (2 layers)
    bw.put(0, 3)            # vps_max_sub_layers_minus1
    bw.put(1, 1)            # vps_temporal_id_nesting_flag
    bw.put(0xFFFF, 16)
    _profile_tier_level(bw, bl)
    bw.put(0, 1)            # vps_sub_layer_ordering_info_present_flag
    bw.ue(4)                # vps_max_dec_pic_buffering_minus1
    bw.ue(0)                # vps_max_num_reorder_pics
    bw.ue(0)                # vps_max_latency_increase_plus1
    bw.put(1, 6)            # vps_max_layer_id
    bw.ue(1)                # vps_num_layer_sets_minus1 (sets {L0},{L0,L1})
    for j in range(2):      # layer_id_included_flag[1][0..1]
        bw.put(1, 1)
    bw.put(0, 1)            # vps_timing_info_present_flag
    bw.put(1, 1)            # vps_extension_flag
    bw.align_one_then_zero()  # alignment ones before the extension

    # ---- vps extension (parse_vps_extension field order) -----------------
    bw.put(0, 1)            # avc_base_layer_flag
    bw.put(0, 1)            # splitting_flag
    for i in range(16):     # scalability_mask: type 2 (spatial/quality)
        bw.put(1 if i == 2 else 0, 1)
    bw.put(0, 3)            # dimension_id_len_minus1[0] -> 1 bit
    bw.put(0, 1)            # vps_nuh_layer_id_present_flag
    bw.put(1, 1)            # dimension_id[1][0] = 1
    bw.put(0, 4)            # view_id_len_minus1
    bw.put(0, 1)            # view_id_val[0] (NumViews == 1)
    bw.put(1, 1)            # direct_dependency_flag[1][0]
    bw.put(0, 1)            # vps_sub_layers_max_minus1_present_flag
    bw.put(0, 1)            # max_tid_ref_present_flag
    bw.put(0, 1)            # all_ref_layers_active_flag
    bw.put(1, 10)           # vps_number_layer_sets_minus1 (checked == 1)
    bw.put(1, 6)            # vps_num_profile_tier_level_minus1
    # PTLExt[1]
    bw.put(1, 1)            # vps_profile_present_flag[1]
    _profile_tier_level(bw, el)
    bw.put(0, 1)            # more_output_layer_sets_than_default_flag
    bw.put(0, 1)            # default_one_target_output_layer_flag
    # output layer set i=1 (<= num_layer_sets-1): no bits except PTL idx
    bw.put(1, 1)            # profile_level_tier_idx[1] (1 bit: n_ptl=2)
    bw.put(0, 1)            # alt_output_layer_flag
    bw.put(0, 1)            # rep_format_idx_present_flag -> one per layer
    for cfg in (bl, el):    # parseRepFormat (hevc_ps.c:411)
        bw.put(1, 1)        # chroma_and_bit_depth_vps_present_flag
        bw.put(cfg.width, 16)
        bw.put(cfg.height, 16)
        bw.put(cfg.chroma_format_idc, 2)
        if cfg.chroma_format_idc == 3:
            bw.put(0, 1)    # separate_colour_plane_vps_flag
        bw.put(cfg.bit_depth - 8, 4)
        bw.put(cfg.bit_depth - 8, 4)
    bw.put(1, 1)            # max_one_active_ref_layer_flag
    # poc_lsb_not_present: only for layers with 0 direct refs -> none
    bw.put(0, 1)            # cross_layer_phase_alignment_flag
    # DPB size table for output layer set 1 (numSubDpbs = 2)
    bw.put(0, 1)            # sub_layer_flag_info_present_flag
    bw.ue(4)                # max_vps_dec_pic_buffering_minus1[1][0][0]
    bw.ue(4)                # max_vps_dec_pic_buffering_minus1[1][1][0]
    bw.ue(0)                # max_vps_num_reorder_pics
    bw.ue(0)                # max_vps_latency_increase_plus1
    bw.ue(0)                # direct_dep_type_len_minus2
    bw.put(1, 1)            # default_direct_dependency_type_flag
    bw.put(0, 2)            # default type 0: sample prediction only
    bw.put(0, 1)            # single_layer_for_non_irap_flag
    bw.put(0, 1)            # higher_layer_irap_skip_flag
    bw.put(0, 1)            # vps_vui_present_flag
    bw.align_one_then_zero()
    return wrap_nal(NAL_VPS, bw.getvalue())


def write_sps_el(cfg: EncoderConfig, st_rps: list | None = None) -> bytes:
    """EL SPS (nuh_layer_id = 1): geometry/bit depth come from the VPS
    rep format; no sub-layers/PTL fields (hevc_ps.c:1556/1572/1653)."""
    bw = BitWriter()
    bw.put(0, 4)            # sps_video_parameter_set_id
    bw.ue(1)                # sps_seq_parameter_set_id = 1
    bw.put(0, 1)            # update_rep_format_flag
    bw.put(0, 1)            # conformance_window_flag
    bw.ue(cfg.log2_max_poc_lsb - 4)
    bw.put(0, 1)            # sps_sub_layer_ordering_info_present_flag
    bw.ue(4)                # sps_max_dec_pic_buffering_minus1
    bw.ue(0)                # sps_max_num_reorder_pics
    bw.ue(0)                # sps_max_latency_increase_plus1
    bw.ue(cfg.min_cb_log2 - 3)
    bw.ue(cfg.ctb_log2 - cfg.min_cb_log2)
    bw.ue(cfg.min_tb_log2 - 2)
    bw.ue(cfg.max_tb_log2 - cfg.min_tb_log2)
    bw.ue(cfg.max_transform_hierarchy_depth)   # inter
    bw.ue(cfg.max_transform_hierarchy_depth)   # intra
    bw.put(0, 1)            # scaling_list_enabled_flag
    bw.put(1 if cfg.amp_enabled else 0, 1)
    bw.put(1 if cfg.sao_enabled else 0, 1)
    bw.put(0, 1)            # pcm_enabled_flag
    st_rps = st_rps or []
    bw.ue(len(st_rps))
    for i, rps in enumerate(st_rps):
        _write_st_rps(bw, i, rps)
    bw.put(0, 1)            # long_term_ref_pics_present_flag
    bw.put(1 if cfg.temporal_mvp else 0, 1)  # sps_temporal_mvp_enabled
    bw.put(1 if cfg.strong_intra_smoothing else 0, 1)
    bw.put(0, 1)            # vui_parameters_present_flag
    bw.put(0, 1)            # sps_extension_flag
    bw.align_one_then_zero()
    return wrap_nal(NAL_SPS, bw.getvalue(), layer_id=1)


def encode_shvc_stream(bl_frames, el_frames, bl_size, el_size, qp=30,
                       seed=0, ctb_log2=4, min_cb_log2=3, el_qp=None,
                       bl_inter=False, el_temporal=False, el_tmvp=False,
                       col_il=False, nonzero_il_mv=False):
    """2-layer SHVC stream. Default: all-intra BL + EL P slices whose
    only reference is the upsampled BL picture of the same AU (sample
    prediction, zero MVs). Options grow it to the full inter-layer
    feature set:
      bl_inter:      BL is a low-delay P chain (real BL motion for mfm)
      el_temporal:   EL L0 mixes the previous EL picture (ST) with the
                     IL reference (LT; cand order ST_BEF then IL_REF0,
                     hevc_refs.c:657)
      el_tmvp:       EL slices enable TMVP (collocated = L0[0], the
                     temporal ref)
      col_il:        collocated_ref_idx points at the IL reference; its
                     motion is the upsampled BL field (mfm,
                     ff_upscale_mv_block, hevc_filter.c:1311)
      nonzero_il_mv: PUs referencing the IL picture carry real MVs (the
                     reference upsamples the displaced CTBs on demand,
                     ff_upsample_block — equal to whole-frame upsample)
    Returns (bytes, el_recons) — EL recon is the closed-loop output.
    bl_frames/el_frames: [(y, u, v)] at BL / EL resolutions."""
    from .intra_enc import IntraFrameEncoder
    from .inter_enc import PFrameEncoder
    from ..ops.upsample_np import upsample_il_frame, upscale_mv_field

    wb, hb = bl_size
    we, he = el_size
    bl = EncoderConfig(width=wb, height=hb, qp=qp, pcm_enabled=False,
                       ctb_log2=ctb_log2, min_cb_log2=min_cb_log2,
                       max_tb_log2=min(5, ctb_log2))
    el = EncoderConfig(width=we, height=he, qp=el_qp or qp,
                       pcm_enabled=False, ctb_log2=ctb_log2,
                       min_cb_log2=min_cb_log2,
                       max_tb_log2=min(5, ctb_log2),
                       max_num_ref=2 if el_temporal else 1,
                       temporal_mvp=el_tmvp)
    rng = np.random.default_rng(seed)
    out = write_vps_shvc(bl, el)
    from .hevc_enc import write_sps
    out += write_sps(bl, st_rps=[[-1]]) + write_pps(bl)
    out += write_sps_el(el, st_rps=[[-1]] if el_temporal else [[]]) + \
        write_pps(el, pps_id=1, sps_id=1, layer_id=1)

    bl_i = IntraFrameEncoder(bl, rng)
    bl_p = PFrameEncoder(bl, rng)
    bl_p.num_st_rps = 1
    bl_p._motion_store = {}
    el_i = IntraFrameEncoder(el, rng)
    el_i.layer_id, el_i.pps_id, el_i.inter_layer_pred = 1, 1, 0
    el_p = PFrameEncoder(el, rng)
    el_p.layer_id, el_p.pps_id, el_p.inter_layer_pred = 1, 1, 1
    el_p.st_rps_idx = 0
    el_p.num_st_rps = 1
    el_p._motion_store = {}
    if el_temporal:
        el_p.num_ref_l0 = None      # header carries the real count
        el_p.ref_lt = False         # per-entry LT flags below
        el_p.collocated_idx = 1 if col_il else 0
    else:
        el_p.num_ref_l0, el_p.ref_lt = 1, True
    el_p.zero_mv = not nonzero_il_mv
    if nonzero_il_mv:
        el_p.il_mv_cap = 11        # sub-3-pel displacements
        el_p.il_every_ctb = True
    el_recons = []
    bl_filtered = {}
    el_filtered = {}
    for i, ((by, bu, bv), (ey, eu, ev)) in enumerate(
            zip(bl_frames, el_frames)):
        if i == 0 or not bl_inter:
            bl_i._parent_chroma = {}
            if i == 0:
                out += bl_i.encode_frame(by, bu, bv,
                                         nal_type=NAL_IDR_N_LP)
            else:
                out += bl_i.encode_frame(by, bu, bv,
                                         nal_type=NAL_TRAIL_R, poc=i,
                                         num_st_rps=1)
            bl_recon = bl_i.recon
            bl_p._motion_store[i] = None
        else:
            bl_p._parent_chroma = {}
            bl_p._pu_list = []
            out += bl_p.encode_frame_p(by, bu, bv, i,
                                       [(i - 1, bl_filtered[i - 1])])
            bl_p.store_motion(i)
            bl_recon = bl_p.recon
        bl_filtered[i] = [p.copy() for p in bl_recon]
        il = upsample_il_frame([p.copy() for p in bl_recon], we, he,
                               bit_depth=el.bit_depth,
                               hs=el.hshift1, vs=el.vshift1)
        if i == 0:
            el_i._parent_chroma = {}
            out += el_i.encode_frame(ey, eu, ev, nal_type=NAL_IDR_N_LP)
            el_recons.append([p.copy() for p in el_i.recon])
            el_filtered[i] = [p.copy() for p in el_i.recon]
        else:
            el_p._parent_chroma = {}
            el_p._pu_list = []
            if el_temporal:
                refs = [(i - 1, el_filtered[i - 1], False),
                        (i, il, True)]
            else:
                refs = [(i, il)]
            if col_il:
                # the collocated picture is the IL ref: its motion is
                # the upsampled BL field (P slices: nb_list=1)
                blm = bl_p._motion_store.get(i)
                h4 = (el.ctbs_h << el.ctb_log2) >> 2
                w4 = (el.ctbs_w << el.ctb_log2) >> 2
                if blm is not None:
                    pf, mv, pocg = upscale_mv_field(
                        blm, wb, hb, we, he, h4, w4, nb_list=1)
                    ltm = blm[3] if len(blm) > 3 else {}
                else:
                    pf = np.zeros((h4, w4), np.uint8)
                    mv = np.zeros((h4, w4, 2, 2), np.int32)
                    pocg = np.zeros((h4, w4, 2), np.int32)
                    ltm = {}
                el_p._motion_store[i] = (pf, mv, pocg, ltm)
            out += el_p.encode_frame_p(ey, eu, ev, i, refs,
                                       slice_type=1)
            if el_tmvp:
                el_p.store_motion(i)
            el_recons.append([p.copy() for p in el_p.recon])
            el_filtered[i] = [p.copy() for p in el_p.recon]
    return out, el_recons
