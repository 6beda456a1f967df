"""Conformant HEVC test-stream encoder (generator for the conformance suite).

This image ships no HEVC bitstreams and has no network access, so the
framework's conformance strategy (SURVEY.md §4) is: encode streams here,
decode them with BOTH the reference decoder (tools/refdec.py, golden oracle
built from /root/reference) and openhevc_tpu, and require bit-exact equality.

The encoder is deliberately minimal but produces spec-valid Main-profile
bitstreams. Coverage grows with the decoder: PCM intra -> residual intra
(all 35 modes, full residual coding) -> inter P/B -> Main10/RExt -> SHVC.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream.bits import BitWriter, wrap_nal
from ..bitstream.cabac import CabacEncoder
from ..bitstream.ctx_tables import CTX_OFFSET, init_states

# NAL unit types (H.265 Table 7-1)
NAL_TRAIL_R = 1
NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_CRA = 21
NAL_VPS = 32
NAL_SPS = 33
NAL_PPS = 34


@dataclass
class EncoderConfig:
    width: int = 64
    height: int = 64
    bit_depth: int = 8
    chroma_format_idc: int = 1          # 1 = 4:2:0
    ctb_log2: int = 4                   # 16x16 CTBs (simplest CU topology)
    min_cb_log2: int = 4
    min_tb_log2: int = 2
    max_tb_log2: int = 4
    max_transform_hierarchy_depth: int = 2
    qp: int = 26
    pcm_enabled: bool = True
    pcm_bit_depth: int = 8
    pcm_min_log2: int = 4
    pcm_max_log2: int = 4
    pcm_loop_filter_disabled: bool = True
    sao_enabled: bool = False
    deblock_disabled: bool = True
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0
    amp_enabled: bool = False
    strong_intra_smoothing: bool = False
    sign_data_hiding: bool = False
    cabac_init: bool = False              # PPS cabac_init_present + flag=1
    lists_modification: bool = False      # PPS lists_modification_present
    transform_skip: bool = False
    transquant_bypass: bool = False
    wpp: bool = False
    tile_cols: int = 1
    tile_rows: int = 1
    # explicit per-tile CTB spans (non-uniform spacing); None = uniform
    tile_widths: tuple | None = None
    tile_heights: tuple | None = None
    log2_max_poc_lsb: int = 8
    max_num_ref: int = 1
    max_merge_cand: int = 5
    weighted_pred: bool = False
    weighted_bipred: bool = False
    temporal_mvp: bool = False
    num_reorder_pics: int = 0           # sps/vps_max_num_reorder_pics
    max_dec_pic_buffering: int = 5      # minus1 written
    level_idc: int = 120
    # scaling lists: None off, "default" (enabled, no data), "sps"
    # (explicit SPS data), "pps" (PPS override data)
    scaling_list: str | None = None
    dependent_slices: bool = False      # PPS dependent_slice_segments_enabled
    lt_ref: bool = False                # SPS long_term_ref_pics_present
    cu_qp_delta_depth: int | None = None  # PPS diff_cu_qp_delta_depth
    constrained_intra: bool = False       # PPS constrained_intra_pred_flag
    # RExt tool flags (SPS range extension)
    rext_rotation: bool = False           # transform_skip_rotation
    rext_implicit_rdpcm: bool = False
    rext_explicit_rdpcm: bool = False
    rext_persistent_rice: bool = False
    cross_component: bool = False         # PPS RExt (4:4:4 only)
    # PPS RExt chroma QP offset lists: None off, else list of (cb, cr)
    chroma_qp_offset_list: tuple | None = None
    diff_cu_chroma_qp_offset_depth: int = 0
    vui_timing: bool = False              # write VUI timing + HRD params

    @property
    def any_rext(self) -> bool:
        return (self.rext_rotation or self.rext_implicit_rdpcm or
                self.rext_explicit_rdpcm or self.rext_persistent_rice or
                self.cross_component or
                bool(self.chroma_qp_offset_list))

    @property
    def ctb_size(self) -> int:
        return 1 << self.ctb_log2

    @property
    def ctbs_w(self) -> int:
        return -(-self.width // self.ctb_size)

    @property
    def ctbs_h(self) -> int:
        return -(-self.height // self.ctb_size)

    def eff_tile_widths(self):
        """Per-tile-column CTB spans (explicit or 6-3 uniform)."""
        if self.tile_widths:
            return list(self.tile_widths)
        nc, cw = self.tile_cols, self.ctbs_w
        return [(i + 1) * cw // nc - i * cw // nc for i in range(nc)]

    def eff_tile_heights(self):
        if self.tile_heights:
            return list(self.tile_heights)
        nr, ch = self.tile_rows, self.ctbs_h
        return [(i + 1) * ch // nr - i * ch // nr for i in range(nr)]

    @property
    def hshift1(self) -> int:
        return 1 if self.chroma_format_idc in (1, 2) else 0

    @property
    def vshift1(self) -> int:
        return 1 if self.chroma_format_idc == 1 else 0


# ---- scaling lists (7.3.4) -------------------------------------------------
SPS_SL_SEED = 7
PPS_SL_SEED = 13


def scaling_list_plan(seed: int):
    """Deterministic custom scaling lists exercising all three 7.3.4
    coding paths (default / explicit DPCM / pred-from-ref).

    Returns (plan, resolved ScalingList) where plan mirrors what
    write_scaling_list_data emits and the resolved list matches what the
    decoder's parse_scaling_list reconstructs (hevc_ps.c:1419)."""
    from ..bitstream.ps import ScalingList, _DIAG4, _DIAG8
    rng = np.random.default_rng(seed)
    sl = ScalingList()
    plan = []
    for size_id in range(4):
        step = 1 if size_id < 3 else 3
        for matrix_id in range(0, 6, step):
            kind = (matrix_id // step + size_id) % 3
            if kind == 2 and matrix_id == 0:
                kind = 1
            if kind == 0:
                plan.append((size_id, matrix_id, "default", None))
            elif kind == 1:
                n = 16 if size_id == 0 else 64
                coefs = rng.integers(8, 48, n).astype(np.int32)
                dc = int(rng.integers(8, 48)) if size_id > 1 else None
                plan.append((size_id, matrix_id, "explicit", (dc, coefs)))
                scan = _DIAG4 if size_id == 0 else _DIAG8
                w = 4 if size_id == 0 else 8
                arr = sl.sl[size_id][matrix_id]
                for i, (x, y) in enumerate(scan):
                    arr[w * y + x] = coefs[i]
                if size_id > 1:
                    sl.sl_dc[size_id - 2][matrix_id] = dc
            else:
                # the reference uses matrix_id - delta un-multiplied even
                # for size 3 (hevc_ps.c:1442), so delta == step refs the
                # previously-coded matrix in both cases
                plan.append((size_id, matrix_id, "ref", step))
                ref = matrix_id - step
                sl.sl[size_id][matrix_id] = sl.sl[size_id][ref].copy()
                if size_id > 1:
                    sl.sl_dc[size_id - 2][matrix_id] = \
                        sl.sl_dc[size_id - 2][ref]
    return plan, sl


def write_scaling_list_data(bw: BitWriter, seed: int):
    """Emit scaling_list_data() (7.3.4) for scaling_list_plan(seed)."""
    from ..bitstream.ps import _DIAG4, _DIAG8
    plan, _ = scaling_list_plan(seed)
    for size_id, matrix_id, kind, payload in plan:
        if kind == "default":
            bw.put(0, 1)    # scaling_list_pred_mode_flag
            bw.ue(0)        # scaling_list_pred_matrix_id_delta
        elif kind == "ref":
            bw.put(0, 1)
            bw.ue(payload)
        else:
            bw.put(1, 1)
            dc, coefs = payload
            prev = 8
            if size_id > 1:
                bw.se(dc - 8)   # scaling_list_dc_coef_minus8
                prev = dc
            for c in coefs:
                delta = (int(c) - prev + 128) % 256 - 128
                bw.se(delta)    # scaling_list_delta_coef
                prev = int(c)


def resolved_scaling(cfg: EncoderConfig):
    """The ScalingList the decoder will actually apply for cfg (selection
    rule of hevc_cabac.c:1484-1486 + 4:4:4 fixup), for the encoder's
    closed-loop recon. None when scaling lists are off."""
    if not cfg.scaling_list:
        return None
    from ..bitstream.ps import ScalingList
    if cfg.scaling_list == "pps":
        sl = scaling_list_plan(PPS_SL_SEED)[1]
    elif cfg.scaling_list == "sps":
        sl = scaling_list_plan(SPS_SL_SEED)[1]
    else:
        sl = ScalingList()
    if cfg.chroma_format_idc == 3:
        sl = sl.copy().apply_444_fixup()
    return sl


def _profile_tier_level(bw: BitWriter, cfg: EncoderConfig):
    bw.put(0, 2)            # general_profile_space
    bw.put(0, 1)            # general_tier_flag
    profile = 2 if cfg.bit_depth > 8 else (4 if cfg.chroma_format_idc != 1 else 1)
    if cfg.any_rext:
        profile = 4         # range-extension tools require the RExt profile
    bw.put(profile, 5)      # general_profile_idc (1 Main / 2 Main10 / 4 RExt)
    compat = (1 << (31 - profile)) | (1 << (31 - 1)) | (1 << (31 - 2))
    bw.put(compat, 32)      # general_profile_compatibility_flag[32]
    bw.put(1, 1)            # general_progressive_source_flag
    bw.put(0, 1)            # general_interlaced_source_flag
    bw.put(0, 1)            # general_non_packed_constraint_flag
    bw.put(1, 1)            # general_frame_only_constraint_flag
    if profile == 4:        # RExt constraint flags occupy the reserved bits
        max_bd = 8 if cfg.bit_depth <= 8 else (10 if cfg.bit_depth <= 10 else 12)
        bw.put(1 if max_bd <= 12 else 0, 1)   # max_12bit_constraint_flag
        bw.put(1 if max_bd <= 10 else 0, 1)   # max_10bit_constraint_flag
        bw.put(1 if max_bd <= 8 else 0, 1)    # max_8bit_constraint_flag
        bw.put(0, 1)        # max_422chroma_constraint_flag
        bw.put(0, 1)        # max_420chroma_constraint_flag
        bw.put(0, 1)        # max_monochrome_constraint_flag
        bw.put(0, 1)        # intra_constraint_flag
        bw.put(0, 1)        # one_picture_only_constraint_flag
        bw.put(0, 1)        # lower_bit_rate_constraint_flag
        bw.put(0, 34)       # reserved_zero_34bits
        bw.put(0, 1)        # general_inbld_flag (9+34+1 = 44 bits total)
    else:
        bw.put(0, 44)       # reserved_zero_43bits + inbld/reserved bit
    bw.put(cfg.level_idc, 8)


def write_vps(cfg: EncoderConfig) -> bytes:
    bw = BitWriter()
    bw.put(0, 4)            # vps_video_parameter_set_id
    bw.put(3, 2)            # vps_reserved_three_2bits
    bw.put(0, 6)            # vps_max_layers_minus1
    bw.put(0, 3)            # vps_max_sub_layers_minus1
    bw.put(1, 1)            # vps_temporal_id_nesting_flag
    bw.put(0xFFFF, 16)      # vps_reserved_0xffff_16bits
    _profile_tier_level(bw, cfg)
    bw.put(0, 1)            # vps_sub_layer_ordering_info_present_flag
    bw.ue(cfg.max_dec_pic_buffering - 1)  # vps_max_dec_pic_buffering_minus1
    bw.ue(cfg.num_reorder_pics)           # vps_max_num_reorder_pics
    bw.ue(0)                # vps_max_latency_increase_plus1
    bw.put(0, 6)            # vps_max_layer_id
    bw.ue(0)                # vps_num_layer_sets_minus1
    bw.put(0, 1)            # vps_timing_info_present_flag
    bw.put(0, 1)            # vps_extension_flag
    bw.align_one_then_zero()
    return wrap_nal(NAL_VPS, bw.getvalue())


def write_sps(cfg: EncoderConfig, st_rps: list | None = None) -> bytes:
    bw = BitWriter()
    bw.put(0, 4)            # sps_video_parameter_set_id
    bw.put(0, 3)            # sps_max_sub_layers_minus1
    bw.put(1, 1)            # sps_temporal_id_nesting_flag
    _profile_tier_level(bw, cfg)
    bw.ue(0)                # sps_seq_parameter_set_id
    bw.ue(cfg.chroma_format_idc)
    if cfg.chroma_format_idc == 3:
        bw.put(0, 1)        # separate_colour_plane_flag
    bw.ue(cfg.width)
    bw.ue(cfg.height)
    bw.put(0, 1)            # conformance_window_flag
    bw.ue(cfg.bit_depth - 8)
    bw.ue(cfg.bit_depth - 8)
    bw.ue(cfg.log2_max_poc_lsb - 4)
    bw.put(0, 1)            # sps_sub_layer_ordering_info_present_flag
    bw.ue(cfg.max_dec_pic_buffering - 1)  # sps_max_dec_pic_buffering_minus1
    bw.ue(cfg.num_reorder_pics)           # sps_max_num_reorder_pics
    bw.ue(0)                # sps_max_latency_increase_plus1
    bw.ue(cfg.min_cb_log2 - 3)
    bw.ue(cfg.ctb_log2 - cfg.min_cb_log2)
    bw.ue(cfg.min_tb_log2 - 2)
    bw.ue(cfg.max_tb_log2 - cfg.min_tb_log2)
    bw.ue(cfg.max_transform_hierarchy_depth)   # inter
    bw.ue(cfg.max_transform_hierarchy_depth)   # intra
    if cfg.scaling_list:
        bw.put(1, 1)        # scaling_list_enabled_flag
        if cfg.scaling_list == "sps":
            bw.put(1, 1)    # sps_scaling_list_data_present_flag
            write_scaling_list_data(bw, SPS_SL_SEED)
        else:
            bw.put(0, 1)    # enabled, default lists
    else:
        bw.put(0, 1)        # scaling_list_enabled_flag
    bw.put(1 if cfg.amp_enabled else 0, 1)
    bw.put(1 if cfg.sao_enabled else 0, 1)
    bw.put(1 if cfg.pcm_enabled else 0, 1)
    if cfg.pcm_enabled:
        bw.put(cfg.pcm_bit_depth - 1, 4)
        bw.put(cfg.pcm_bit_depth - 1, 4)
        bw.ue(cfg.pcm_min_log2 - 3)
        bw.ue(cfg.pcm_max_log2 - cfg.pcm_min_log2)
        bw.put(1 if cfg.pcm_loop_filter_disabled else 0, 1)
    st_rps = st_rps or []
    bw.ue(len(st_rps))      # num_short_term_ref_pic_sets
    for i, rps in enumerate(st_rps):
        _write_st_rps(bw, i, rps)
    if cfg.lt_ref:
        bw.put(1, 1)        # long_term_ref_pics_present_flag
        bw.ue(0)            # num_long_term_ref_pics_sps
    else:
        bw.put(0, 1)        # long_term_ref_pics_present_flag
    bw.put(1 if cfg.temporal_mvp else 0, 1)  # sps_temporal_mvp_enabled
    bw.put(1 if cfg.strong_intra_smoothing else 0, 1)
    if cfg.vui_timing:
        bw.put(1, 1)        # vui_parameters_present_flag
        _write_vui_timing_hrd(bw)
    else:
        bw.put(0, 1)        # vui_parameters_present_flag
    if cfg.any_rext:
        bw.put(1, 1)        # sps_extension_present_flag
        bw.put(1, 1)        # sps_range_extension_flag
        bw.put(0, 7)        # sps_extension_7bits
        bw.put(1 if cfg.rext_rotation else 0, 1)
        bw.put(0, 1)        # transform_skip_context_enabled
        bw.put(1 if cfg.rext_implicit_rdpcm else 0, 1)
        bw.put(1 if cfg.rext_explicit_rdpcm else 0, 1)
        bw.put(0, 1)        # extended_precision_processing
        bw.put(0, 1)        # intra_smoothing_disabled
        bw.put(0, 1)        # high_precision_offsets
        bw.put(1 if cfg.rext_persistent_rice else 0, 1)
        bw.put(0, 1)        # cabac_bypass_alignment
    else:
        bw.put(0, 1)        # sps_extension_flag
    bw.align_one_then_zero()
    return wrap_nal(NAL_SPS, bw.getvalue())


def _write_vui_timing_hrd(bw: BitWriter):
    """VUI carrying timing info + NAL HRD parameters (7.3.2.11) so the
    decoder's skip-correct HRD parse (bitstream/ps.py _parse_hrd, mirroring
    hevc_ps.c:269-343) is exercised end-to-end."""
    bw.put(1, 1)            # aspect_ratio_info_present
    bw.put(1, 8)            # aspect_ratio_idc = 1 (square, Table E-1)
    bw.put(0, 1)            # overscan_info_present
    bw.put(0, 1)            # video_signal_type_present
    bw.put(0, 1)            # chroma_loc_info_present
    bw.put(0, 3)            # neutral_chroma + field_seq + frame_field_info
    bw.put(0, 1)            # default_display_window
    bw.put(1, 1)            # vui_timing_info_present
    bw.put(1000, 32)        # vui_num_units_in_tick
    bw.put(60000, 32)       # vui_time_scale (60 fps)
    bw.put(0, 1)            # poc_proportional_to_timing
    bw.put(1, 1)            # vui_hrd_parameters_present
    # hrd_parameters(commonInfPresent=1, maxNumSubLayersMinus1=0)
    bw.put(1, 1)            # nal_hrd_parameters_present
    bw.put(0, 1)            # vcl_hrd_parameters_present
    bw.put(0, 1)            # sub_pic_hrd_params_present
    bw.put(0, 4)            # bit_rate_scale
    bw.put(0, 4)            # cpb_size_scale
    bw.put(23, 5)           # initial_cpb_removal_delay_length_minus1
    bw.put(23, 5)           # au_cpb_removal_delay_length_minus1
    bw.put(23, 5)           # dpb_output_delay_length_minus1
    # sub-layer 0: fixed rate, 1 CPB
    bw.put(1, 1)            # fixed_pic_rate_general
    bw.ue(0)                # elemental_duration_in_tc_minus1
    bw.ue(0)                # cpb_cnt_minus1 = 0 -> 1 CPB
    # sub_layer_hrd_parameters (NAL), 1 CPB
    bw.ue(30000)            # bit_rate_value_minus1
    bw.ue(300000)           # cpb_size_value_minus1
    bw.put(0, 1)            # cbr_flag
    bw.put(0, 1)            # bitstream_restriction


def _write_st_rps(bw: BitWriter, idx: int, rps):
    """rps: either a legacy list of negative poc deltas (<0, closest
    first, all used) or a tuple (neg, pos) where neg is
    [(delta<0, used)] closest-first and pos is [(delta>0, used)]
    ascending — the explicit st_ref_pic_set layout of 7.3.7 (parse
    mirror: bitstream/ps.py parse_st_rps; hevc_ps.c ff_hevc_decode_
    short_term_rps). Entries with used=0 are the RPS-follow set: kept
    in the DPB for later pictures but absent from this picture's
    lists — exactly what hierarchical-B retention produces."""
    if idx != 0:
        bw.put(0, 1)        # inter_ref_pic_set_prediction_flag (not used)
    if isinstance(rps, tuple):
        neg, pos = rps
    else:
        neg, pos = [(d, 1) for d in rps], []
    bw.ue(len(neg))         # num_negative_pics
    bw.ue(len(pos))         # num_positive_pics
    prev = 0
    for d, used in neg:
        bw.ue(prev - d - 1)  # delta_poc_s0_minus1
        prev = d
        bw.put(used, 1)      # used_by_curr_pic_s0_flag
    prev = 0
    for d, used in pos:
        bw.ue(d - prev - 1)  # delta_poc_s1_minus1
        prev = d
        bw.put(used, 1)      # used_by_curr_pic_s1_flag
    return


def write_pps(cfg: EncoderConfig, pps_id: int = 0, sps_id: int = 0,
              layer_id: int = 0) -> bytes:
    bw = BitWriter()
    bw.ue(pps_id)           # pps_pic_parameter_set_id
    bw.ue(sps_id)           # pps_seq_parameter_set_id
    bw.put(1 if cfg.dependent_slices else 0, 1)  # dependent_slice_segments
    bw.put(0, 1)            # output_flag_present_flag
    bw.put(0, 3)            # num_extra_slice_header_bits
    bw.put(1 if cfg.sign_data_hiding else 0, 1)
    bw.put(1 if cfg.cabac_init else 0, 1)  # cabac_init_present_flag
    bw.ue(cfg.max_num_ref - 1)  # num_ref_idx_l0_default_active_minus1
    bw.ue(cfg.max_num_ref - 1)  # num_ref_idx_l1_default_active_minus1
    bw.se(cfg.qp - 26)      # init_qp_minus26
    bw.put(1 if cfg.constrained_intra else 0, 1)  # constrained_intra_pred
    bw.put(1 if cfg.transform_skip else 0, 1)
    if cfg.cu_qp_delta_depth is not None:
        bw.put(1, 1)        # cu_qp_delta_enabled_flag
        bw.ue(cfg.cu_qp_delta_depth)
    else:
        bw.put(0, 1)        # cu_qp_delta_enabled_flag
    bw.se(0)                # pps_cb_qp_offset
    bw.se(0)                # pps_cr_qp_offset
    bw.put(0, 1)            # pps_slice_chroma_qp_offsets_present_flag
    bw.put(1 if cfg.weighted_pred else 0, 1)   # weighted_pred_flag
    bw.put(1 if cfg.weighted_pred else 0, 1)   # weighted_bipred_flag
    bw.put(1 if cfg.transquant_bypass else 0, 1)  # transquant_bypass_enabled_flag
    tiles = cfg.tile_cols > 1 or cfg.tile_rows > 1
    bw.put(1 if tiles else 0, 1)       # tiles_enabled_flag
    bw.put(1 if cfg.wpp else 0, 1)     # entropy_coding_sync_enabled_flag
    if tiles:
        bw.ue(cfg.tile_cols - 1)
        bw.ue(cfg.tile_rows - 1)
        if cfg.tile_widths or cfg.tile_heights:
            bw.put(0, 1)               # uniform_spacing_flag
            for w in cfg.eff_tile_widths()[:-1]:
                bw.ue(w - 1)           # column_width_minus1
            for h in cfg.eff_tile_heights()[:-1]:
                bw.ue(h - 1)           # row_height_minus1
        else:
            bw.put(1, 1)               # uniform_spacing_flag
        bw.put(1, 1)                   # loop_filter_across_tiles_enabled_flag
    bw.put(1, 1)            # pps_loop_filter_across_slices_enabled_flag
    bw.put(1, 1)            # deblocking_filter_control_present_flag
    bw.put(0, 1)            # deblocking_filter_override_enabled_flag
    bw.put(1 if cfg.deblock_disabled else 0, 1)  # pps_deblocking_filter_disabled_flag
    if not cfg.deblock_disabled:
        bw.se(cfg.beta_offset_div2)   # pps_beta_offset_div2
        bw.se(cfg.tc_offset_div2)     # pps_tc_offset_div2
    if layer_id > 0:
        bw.put(0, 1)        # pps_infer_scaling_list_flag (hevc_ps.c:2383)
    if cfg.scaling_list == "pps":
        bw.put(1, 1)        # pps_scaling_list_data_present_flag
        write_scaling_list_data(bw, PPS_SL_SEED)
    else:
        bw.put(0, 1)        # pps_scaling_list_data_present_flag
    bw.put(1 if cfg.lists_modification else 0, 1)
    bw.ue(0)                # log2_parallel_merge_level_minus2
    bw.put(0, 1)            # slice_segment_header_extension_present_flag
    if cfg.cross_component or cfg.chroma_qp_offset_list:
        bw.put(1, 1)        # pps_extension_present_flag
        bw.put(1, 1)        # pps_range_extensions_flag
        bw.put(0, 7)        # pps_extension_7bits
        if cfg.transform_skip:
            bw.ue(0)        # log2_max_transform_skip_block_size_minus2
        bw.put(1 if cfg.cross_component else 0, 1)  # cross_component_
        if cfg.chroma_qp_offset_list:
            bw.put(1, 1)    # chroma_qp_offset_list_enabled_flag
            bw.ue(cfg.diff_cu_chroma_qp_offset_depth)
            bw.ue(len(cfg.chroma_qp_offset_list) - 1)
            for (cb, cr) in cfg.chroma_qp_offset_list:
                bw.se(cb)   # cb_qp_offset_list[i]
                bw.se(cr)   # cr_qp_offset_list[i]
        else:
            bw.put(0, 1)    # chroma_qp_offset_list_enabled_flag
        bw.ue(0)            # log2_sao_offset_scale_luma
        bw.ue(0)            # log2_sao_offset_scale_chroma
    else:
        bw.put(0, 1)        # pps_extension_flag
    bw.align_one_then_zero()
    return wrap_nal(NAL_PPS, bw.getvalue(), layer_id=layer_id)


def _write_pred_weight_table(bw: BitWriter, cfg, wt, slice_type):
    """7.3.6.3 emission (inverse of slice.py _parse_pred_weight_table);
    all per-ref weight flags set explicitly."""
    dn = wt["luma_log2_denom"]
    dnc = wt["chroma_log2_denom"]
    bw.ue(dn)
    bw.se(dnc - dn)
    for lx in ("l0", "l1"):
        if lx == "l1" and slice_type != 0:
            break
        entries = wt[lx]
        for _ in entries:
            bw.put(1, 1)            # luma_weight_lX_flag
        for _ in entries:
            bw.put(1, 1)            # chroma_weight_lX_flag
        for lw, lo, cw, co in entries:
            bw.se(lw - (1 << dn))
            bw.se(lo)
            for j in range(2):
                bw.se(cw[j] - (1 << dnc))
                bw.se(co[j] + ((128 * cw[j]) >> dnc) - 128)


def write_slice_header(bw: BitWriter, cfg: EncoderConfig, nal_type: int,
                       slice_type: int, poc: int = 0,
                       st_rps_idx: int = 0, num_st_rps: int = 0,
                       num_ref_l0: int | None = None,
                       num_ref_l1: int | None = None,
                       entry_point_offsets: list | None = None,
                       weight_table: dict | None = None,
                       pps_id: int = 0,
                       inter_layer_pred: int | None = None,
                       first_slice: int = 1, segment_address: int = 0,
                       dependent: int = 0, lt_entries: list | None = None,
                       collocated_ref_idx: int = 0,
                       list_mod: tuple | None = None,
                       num_pics_total_curr: int = 0):
    """slice_type: 0=B 1=P 2=I. Only the syntax paths this encoder exercises.
    Non-first slice segments carry segment_address (CTB raster) and, when
    the PPS enables them, the dependent_slice_segment_flag (7.3.6.1)."""
    bw.put(first_slice, 1)  # first_slice_segment_in_pic_flag
    if 16 <= nal_type <= 23:
        bw.put(0, 1)        # no_output_of_prior_pics_flag
    bw.ue(pps_id)           # slice_pic_parameter_set_id
    if not first_slice:
        if cfg.dependent_slices:
            bw.put(dependent, 1)
        import math
        n_ctbs = cfg.ctbs_w * cfg.ctbs_h
        addr_bits = max(1, math.ceil(math.log2(n_ctbs)))
        bw.put(segment_address, addr_bits)
    if dependent:
        # dependent segments inherit the whole slice body; only entry
        # points + alignment follow
        if cfg.wpp or cfg.tile_cols > 1 or cfg.tile_rows > 1:
            eps = entry_point_offsets or []
            bw.ue(len(eps))
            if eps:
                blen = max(1, max(e - 1 for e in eps).bit_length())
                bw.ue(blen - 1)
                for e in eps:
                    bw.put(e - 1, blen)
        bw.put(1, 1)        # alignment_bit_equal_to_one
        bw.align_zero()
        return
    bw.ue(slice_type)
    if inter_layer_pred is not None and \
            nal_type in (NAL_IDR_W_RADL, NAL_IDR_N_LP):
        # SHVC EL IDR still carries pic_order_cnt_lsb (hevc.c:728)
        bw.put(poc % (1 << cfg.log2_max_poc_lsb), cfg.log2_max_poc_lsb)
    if nal_type not in (NAL_IDR_W_RADL, NAL_IDR_N_LP):
        bw.put(poc % (1 << cfg.log2_max_poc_lsb), cfg.log2_max_poc_lsb)
        if num_st_rps == 0:
            raise ValueError("non-IDR requires an SPS short-term RPS")
        bw.put(1, 1)        # short_term_ref_pic_set_sps_flag
        nbits = max(1, (num_st_rps - 1).bit_length())
        if num_st_rps > 1:
            bw.put(st_rps_idx, nbits)
        if cfg.lt_ref:
            # (num_long_term_sps absent: sps carries no LT candidates)
            ents = lt_entries or []
            bw.ue(len(ents))            # num_long_term_pics
            for (lsb, used, cyc) in ents:
                bw.put(lsb, cfg.log2_max_poc_lsb)  # poc_lsb_lt
                bw.put(used, 1)                    # used_by_curr_pic_lt
                if cyc is None:
                    bw.put(0, 1)        # delta_poc_msb_present_flag
                else:
                    bw.put(1, 1)
                    bw.ue(cyc)          # delta_poc_msb_cycle_lt
        if cfg.temporal_mvp:
            bw.put(1, 1)    # slice_temporal_mvp_enabled_flag
    if inter_layer_pred is not None:
        # SHVC EL: one flag with NumDirectRefLayers==1 (hevc.c:808)
        bw.put(1 if inter_layer_pred else 0, 1)
    if cfg.sao_enabled:
        bw.put(1, 1)        # slice_sao_luma_flag
        bw.put(1, 1)        # slice_sao_chroma_flag
    if slice_type != 2:
        override = (num_ref_l0 is not None and
                    (num_ref_l0 != cfg.max_num_ref or
                     (slice_type == 0 and num_ref_l1 not in
                      (None, cfg.max_num_ref))))
        bw.put(1 if override else 0, 1)  # num_ref_idx_active_override_flag
        if override:
            bw.ue(num_ref_l0 - 1)
            if slice_type == 0:
                bw.ue((num_ref_l1 or num_ref_l0) - 1)
        if cfg.lists_modification and num_pics_total_curr > 1:
            # ref_pic_list_modification() (7.3.6.2): explicit
            # list_entry_lX permutations over the RPS candidate list
            import math
            bits = math.ceil(math.log2(num_pics_total_curr))
            ents0, ents1 = list_mod if list_mod else (None, None)
            bw.put(1 if ents0 else 0, 1)  # ref_pic_list_modification_l0
            if ents0:
                for e in ents0:
                    bw.put(e, bits)       # list_entry_l0
            if slice_type == 0:
                bw.put(1 if ents1 else 0, 1)
                if ents1:
                    for e in ents1:
                        bw.put(e, bits)   # list_entry_l1
        if slice_type == 0:
            bw.put(0, 1)    # mvd_l1_zero_flag
        if cfg.cabac_init:
            bw.put(1, 1)    # cabac_init_flag (swap P/B init tables)
        if cfg.temporal_mvp:
            if slice_type == 0:
                bw.put(1, 1)        # collocated_from_l0_flag
            if num_ref_l0 is not None and num_ref_l0 > 1:
                bw.ue(collocated_ref_idx)
        if cfg.weighted_pred and weight_table is not None:
            _write_pred_weight_table(bw, cfg, weight_table, slice_type)
        bw.ue(5 - cfg.max_merge_cand)  # five_minus_max_num_merge_cand
    bw.se(0)                # slice_qp_delta
    if cfg.chroma_qp_offset_list:
        bw.put(1, 1)        # cu_chroma_qp_offset_enabled_flag
    if cfg.sao_enabled or not cfg.deblock_disabled:
        bw.put(1, 1)        # slice_loop_filter_across_slices_enabled_flag
    if cfg.wpp or cfg.tile_cols > 1 or cfg.tile_rows > 1:
        eps = entry_point_offsets or []
        bw.ue(len(eps))     # num_entry_point_offsets
        if eps:
            blen = max(1, max(e - 1 for e in eps).bit_length())
            bw.ue(blen - 1)  # offset_len_minus1
            for e in eps:
                bw.put(e - 1, blen)  # entry_point_offset_minus1
    bw.put(1, 1)            # byte_alignment: alignment_bit_equal_to_one
    bw.align_zero()


class SliceDataEncoder:
    """CABAC slice-data writer: owns the engine + context states."""

    def __init__(self, bw: BitWriter, cfg: EncoderConfig, slice_type: int,
                 ctx=None):
        self.bw = bw
        self.cfg = cfg
        init_type = (0 if slice_type == 2 else
                     2 if slice_type == 0 else 1)
        if cfg.cabac_init and slice_type != 2:
            # cabac_init_flag=1 swaps the P/B init tables
            # (initType derivation, 9.3.2.2; hevc_cabac.c:606)
            init_type = 3 - init_type
        # dependent slice segments resume the previous segment's contexts
        self.ctx = list(ctx) if ctx is not None else \
            init_states(init_type, cfg.qp)
        self.cabac = CabacEncoder(bw)

    def bin(self, elem: str, inc: int, val: int):
        self.cabac.encode_bin(self.ctx, CTX_OFFSET[elem] + inc, val)

    def bypass(self, val: int):
        self.cabac.encode_bypass(val)

    def bypass_bits(self, val: int, n: int):
        self.cabac.encode_bypass_bits(val, n)

    def terminate(self, val: int):
        self.cabac.encode_terminate(val)

    def pcm_payload(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """pcm_flag=1 has just been coded via terminate(1): align + raw
        samples + engine restart (contexts persist)."""
        self.bw.align_zero()
        bd = self.cfg.pcm_bit_depth
        for plane in (y, u, v):
            for s in np.asarray(plane, dtype=np.int64).reshape(-1):
                self.bw.put(int(s), bd)
        self.bw.align_zero()
        self.cabac.restart()


def encode_pcm_frame(cfg: EncoderConfig, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray, nal_type: int = NAL_IDR_N_LP) -> bytes:
    """All-PCM intra frame: every CTB is one PCM CU (requires
    ctb == min_cb == pcm size and dimensions multiple of ctb)."""
    assert cfg.ctb_log2 == cfg.min_cb_log2 == cfg.pcm_min_log2 == cfg.pcm_max_log2
    cs = cfg.ctb_size
    assert cfg.width % cs == 0 and cfg.height % cs == 0
    bw = BitWriter()
    write_slice_header(bw, cfg, nal_type, slice_type=2)
    enc = SliceDataEncoder(bw, cfg, slice_type=2)
    n_ctb = cfg.ctbs_w * cfg.ctbs_h
    for addr in range(n_ctb):
        cx = (addr % cfg.ctbs_w) * cs
        cy = (addr // cfg.ctbs_w) * cs
        # coding_unit(16x16 == min CB): part_mode bin0=1 (PART_2Nx2N)
        enc.bin("part_mode", 0, 1)
        enc.terminate(1)  # pcm_flag = 1
        enc.pcm_payload(y[cy:cy + cs, cx:cx + cs],
                        u[cy // 2:(cy + cs) // 2, cx // 2:(cx + cs) // 2],
                        v[cy // 2:(cy + cs) // 2, cx // 2:(cx + cs) // 2])
        enc.terminate(1 if addr == n_ctb - 1 else 0)  # end_of_slice
    bw.align_zero()
    return wrap_nal(nal_type, bw.getvalue())


def encode_pcm_stream(frames, width: int, height: int) -> bytes:
    """frames: list of (y, u, v) uint8 arrays. Returns an Annex-B stream."""
    cfg = EncoderConfig(width=width, height=height)
    out = write_vps(cfg) + write_sps(cfg) + write_pps(cfg)
    for (y, u, v) in frames:
        out += encode_pcm_frame(cfg, y, u, v)
    return out
