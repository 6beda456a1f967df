"""Intra-frame HEVC encoder with full residual coding (test-stream generator).

Exercises the decoder's complete intra tool set: CU quadtree (split_cu_flag
with depth contexts), part 2Nx2N / NxN, all 35 luma modes + 5 chroma modes,
TU trees (split_transform_flag, cbf inheritance), DST 4x4, DCT 4-32,
mode-dependent scans, full residual CABAC (last-sig, CG flags, sig map,
greater1/2, Rice remaining), optional PCM interleaving.

Closed-loop: predicts from its own reconstruction using the *decoder's*
exact ops (ops/intra_np.py, ops/transforms_np.py) and the shared
availability logic (bitstream/syntax.avail_mask), so the decoded output is
bit-identical to the encoder's recon — which the tests then cross-check
against the reference decoder's output.
"""
from __future__ import annotations

import numpy as np

from ..bitstream.bits import BitWriter, wrap_nal
from ..bitstream.syntax import (avail_mask, zscan_grid, _SCANS_4, _CG_SCANS,
                                SIG_CTX_MAP, chroma_qp,
                                SCAN_DIAG, SCAN_HORIZ, SCAN_VERT)
from ..ops import intra_np as I
from ..ops import transforms_np as T
from .hevc_enc import (EncoderConfig, SliceDataEncoder, write_vps, write_sps,
                       write_pps, write_slice_header, NAL_IDR_N_LP)


class _Sps:
    """Just enough SPS-shaped geometry for zscan_grid."""
    def __init__(self, cfg: EncoderConfig):
        self.log2_ctb = cfg.ctb_log2
        self.ctbs_w = cfg.ctbs_w
        self.ctbs_h = cfg.ctbs_h


class IntraFrameEncoder:
    def __init__(self, cfg: EncoderConfig, rng: np.random.Generator):
        self.cfg = cfg
        self.rng = rng
        self.sdh_hidden_signs = 0     # sign-data-hiding coverage count
        from .hevc_enc import resolved_scaling
        self.scaling = resolved_scaling(cfg)
        w4 = (cfg.ctbs_w << cfg.ctb_log2) >> 2
        h4 = (cfg.ctbs_h << cfg.ctb_log2) >> 2
        self.w4, self.h4 = w4, h4
        self.tiles = cfg.tile_cols > 1 or cfg.tile_rows > 1
        self.wpp = cfg.wpp
        if self.tiles:
            from ..bitstream.ps import ctb_tile_maps

            class _PpsShim:
                tiles_enabled = 1
                num_tile_cols = cfg.tile_cols
                num_tile_rows = cfg.tile_rows
                uniform_spacing = 0 if (cfg.tile_widths or
                                        cfg.tile_heights) else 1
                col_widths = cfg.eff_tile_widths()[:-1]
                row_heights = cfg.eff_tile_heights()[:-1]
            rs_to_ts, ts_order, tile_id, col_bd, row_bd = \
                ctb_tile_maps(_PpsShim(), _Sps(cfg))
            self.ts_order = ts_order
            self.tile_id = tile_id
            self.col_bd, self.row_bd = col_bd, row_bd
            n4c = 1 << (cfg.ctb_log2 - 2)
            self.tile4 = np.repeat(np.repeat(tile_id, n4c, 0), n4c, 1)
            self.zscan = zscan_grid(_Sps(cfg), rs_to_ts)
        else:
            self.ts_order = np.arange(cfg.ctbs_w * cfg.ctbs_h)
            self.tile_id = np.zeros((cfg.ctbs_h, cfg.ctbs_w), np.int32)
            self.col_bd = np.array([0, cfg.ctbs_w])
            self.tile4 = None
            self.zscan = zscan_grid(_Sps(cfg))

    region4 = None        # per-4x4 slice-region ids (multi-slice frames)
    region_ctb = None

    # ---- cu_qp_delta (mirrors SliceDataParser's state machine) ----------
    def _qp_reset_slice(self, dependent=False):
        cfg = self.cfg
        # cu_chroma_qp_offset state (reset per slice, hevc.c:1091-1092)
        self.cqo_on = bool(getattr(cfg, "chroma_qp_offset_list", None))
        self.cqo_cb = self.cqo_cr = 0
        self.cqo_sel = (0, 0)
        self.cqo_emitted = True
        self.qpd_on = cfg.cu_qp_delta_depth is not None
        if not self.qpd_on:
            return
        self.qg_mask = (1 << (cfg.ctb_log2 - cfg.cu_qp_delta_depth)) - 1
        if not dependent:
            self.qp_y = cfg.qp
            self.qPy_pred = cfg.qp
        self.first_qp_group = not dependent
        self.is_qp_coded = 0
        self.qg_delta = 0
        self.qg_target = 0
        self.emit_delta_value = None
        self.qp_try = self.qp_y
        if getattr(self, "qp_y4", None) is None or not dependent:
            self.qp_y4 = np.full((self.h4, self.w4), cfg.qp, np.int8)

    def _qp_pred(self, x_base, y_base, delta, mutate):
        """get_qPy_pred + set_qPy (hevc_filter.c:91-143); with
        mutate=False it only previews the QP this CU would get."""
        cfg = self.cfg
        ctb_mask = (1 << cfg.ctb_log2) - 1
        x_qg = x_base - (x_base & self.qg_mask)
        y_qg = y_base - (y_base & self.qg_mask)
        avail_a = (x_base & ctb_mask) and (x_qg & ctb_mask)
        avail_b = (y_base & ctb_mask) and (y_qg & ctb_mask)
        if self.first_qp_group or (x_qg == 0 and y_qg == 0):
            if mutate:
                self.first_qp_group = not self.is_qp_coded
            pred = cfg.qp
        else:
            pred = self.qPy_pred
        qa = int(self.qp_y4[y_qg >> 2, (x_qg - 1) >> 2]) \
            if avail_a else pred
        qb = int(self.qp_y4[(y_qg - 1) >> 2, x_qg >> 2]) \
            if avail_b else pred
        qp = (qa + qb + 1) >> 1
        if delta:
            off = 6 * (cfg.bit_depth - 8)
            qp = (qp + delta + 52 + 2 * off) % (52 + off) - off
        if mutate:
            self.qp_y = qp
        return qp

    def _emit_cu_qp_delta(self, d):
        """cu_qp_delta_abs (TU prefix <=5 + EG0 suffix) + sign
        (hevc_cabac.c:731)."""
        enc = self.enc
        a = abs(d)
        prefix = min(a, 5)
        for i in range(prefix):
            enc.bin("cu_qp_delta", 0 if i == 0 else 1, 1)
        if prefix < 5:
            enc.bin("cu_qp_delta", 0 if prefix == 0 else 1, 0)
        else:
            rem = a - 5
            k = 0
            while rem >= (1 << (k + 1)) - 1:
                enc.bypass(1)
                k += 1
            enc.bypass(0)
            val = rem - ((1 << k) - 1)
            for b in range(k - 1, -1, -1):
                enc.bypass((val >> b) & 1)
        if a:
            enc.bypass(1 if d < 0 else 0)

    def _same_tile4(self, xa4, ya4, xb4, yb4):
        if self.region4 is not None:
            return self.region4[ya4, xa4] == self.region4[yb4, xb4]
        if self.tile4 is None:
            return True
        return self.tile4[ya4, xa4] == self.tile4[yb4, xb4]

    def _tile_width_of(self, rs):
        rx = rs % self.cfg.ctbs_w
        c = int(np.searchsorted(self.col_bd, rx, side="right")) - 1
        return int(self.col_bd[c + 1] - self.col_bd[c])

    layer_id = 0          # SHVC: nuh_layer_id of emitted NALs
    temporal_id = 0       # sub-layer id of emitted VCL NALs
    pps_id = 0
    inter_layer_pred = None   # EL slice-header flag (None: BL, absent)

    def encode_frame(self, y, u, v, nal_type=NAL_IDR_N_LP, poc=0,
                     num_st_rps=0, num_slices=1,
                     dependent=False, st_rps_idx=0) -> bytes:
        cfg = self.cfg
        self.target = [np.asarray(y, np.int64), np.asarray(u, np.int64),
                       np.asarray(v, np.int64)]
        W, H = cfg.width, cfg.height
        hs, vs = cfg.hshift1, cfg.vshift1
        self.recon = [np.zeros((H, W), np.int64),
                      np.zeros((H >> vs, W >> hs), np.int64),
                      np.zeros((H >> vs, W >> hs), np.int64)]
        self.ipm = np.full((self.h4, self.w4), 255, np.uint8)
        self.pred_mode = np.ones((self.h4, self.w4), np.uint8)  # all intra
        self.ct_depth = np.zeros((self.h4, self.w4), np.int8)
        if num_slices > 1:
            return self._encode_frame_sliced(nal_type, poc, num_st_rps,
                                             num_slices, dependent, 2)
        data, eps = self._encode_slice_data(slice_type=2)
        bw = BitWriter()
        write_slice_header(bw, cfg, nal_type, slice_type=2, poc=poc,
                           num_st_rps=num_st_rps, st_rps_idx=st_rps_idx,
                           entry_point_offsets=eps, pps_id=self.pps_id,
                           inter_layer_pred=self.inter_layer_pred)
        return wrap_nal(nal_type, bw.getvalue() + data,
                        layer_id=self.layer_id,
                        temporal_id=self.temporal_id)

    def _encode_frame_sliced(self, nal_type, poc, num_st_rps, num_slices,
                             dependent, slice_type, **hdr_kw) -> bytes:
        """Emit the picture as num_slices slice segments (one NAL each).
        dependent=True makes every non-first segment a dependent slice
        segment (inherited header + resumed CABAC contexts)."""
        cfg = self.cfg
        n_ctb = cfg.ctbs_w * cfg.ctbs_h
        bounds = [round(i * n_ctb / num_slices)
                  for i in range(num_slices + 1)]
        ranges = [(bounds[i], bounds[i + 1],
                   1 if (dependent and i > 0) else 0)
                  for i in range(num_slices) if bounds[i] < bounds[i + 1]]
        segs = self._encode_slice_data(slice_type=slice_type,
                                       slice_ranges=ranges)
        out = b""
        for i, ((data, eps), (st, _en, dep)) in enumerate(zip(segs, ranges)):
            bw = BitWriter()
            write_slice_header(bw, cfg, nal_type, slice_type=slice_type,
                               poc=poc, num_st_rps=num_st_rps,
                               entry_point_offsets=eps, pps_id=self.pps_id,
                               inter_layer_pred=self.inter_layer_pred,
                               first_slice=1 if i == 0 else 0,
                               segment_address=int(self.ts_order[st]),
                               dependent=dep, **hdr_kw)
            out += wrap_nal(nal_type, bw.getvalue() + data,
                            temporal_id=self.temporal_id,
                            layer_id=self.layer_id)
        return out

    def _encode_slice_data(self, slice_type, slice_ranges=None):
        """CTB loop in tile-scan order with WPP/tile substream handling;
        returns (data bytes, escaped entry-point offsets). With
        slice_ranges (list of (start_ts, end_ts, dependent)), encodes a
        multi-segment picture and returns a list of (data, eps) per
        segment instead."""
        cfg = self.cfg
        if slice_ranges is not None:
            return self._encode_slice_segments(slice_type, slice_ranges)
        self._qp_reset_slice()
        self.stat_coeff = [0, 0, 0, 0]
        bw = BitWriter()
        self.enc = SliceDataEncoder(bw, cfg, slice_type=slice_type)
        cs = cfg.ctb_size
        n_ctb = cfg.ctbs_w * cfg.ctbs_h
        self.sao_params = np.zeros((cfg.ctbs_h, cfg.ctbs_w, 3, 6), np.int16)
        boundaries = []
        saved_ctx = None
        ctb_tile_rs = 0
        from ..bitstream.ctx_tables import init_states
        init_type = (0 if slice_type == 2 else
                     2 if slice_type == 0 else 1)
        for ts in range(n_ctb):
            rs = int(self.ts_order[ts])
            x0 = (rs % cfg.ctbs_w) * cs
            y0 = (rs // cfg.ctbs_w) * cs
            tw = self._tile_width_of(rs)
            if ts > 0:
                prev_rs = int(self.ts_order[ts - 1])
                new_tile = self.tiles and \
                    self.tile_id.flat[rs] != self.tile_id.flat[prev_rs]
                new_row = (self.wpp and ctb_tile_rs % tw == 0 and
                           not new_tile)
                if new_tile or new_row:
                    self.enc.terminate(1)   # end_of_subset_one_bit
                    bw.align_zero()
                    boundaries.append(bw.bitpos // 8)
                    self.enc.cabac.restart()
                    if new_tile:
                        ctb_tile_rs = 0
                        self.enc.ctx = init_states(init_type,
                                                   max(0, min(51, cfg.qp)))
                        self.stat_coeff = [0, 0, 0, 0]
                    elif tw == 1:
                        self.enc.ctx = init_states(init_type,
                                                   max(0, min(51, cfg.qp)))
                        self.stat_coeff = [0, 0, 0, 0]
                    else:
                        # load_states copies contexts ONLY: StatCoeff
                        # carries over serially across WPP rows
                        # (hevc_cabac.c:562)
                        self.enc.ctx = list(saved_ctx[0])
            if cfg.sao_enabled:
                self._encode_sao(x0 >> cfg.ctb_log2, y0 >> cfg.ctb_log2)
            self._quadtree(x0, y0, cfg.ctb_log2, 0)
            ctb_tile_rs += 1
            if self.wpp and (ctb_tile_rs % tw == 2 or
                             (tw == 2 and ctb_tile_rs % tw == 0)):
                saved_ctx = (list(self.enc.ctx), list(self.stat_coeff))
            self.enc.terminate(1 if ts == n_ctb - 1 else 0)
        bw.align_zero()
        data = bw.getvalue()
        return data, self._escaped_offsets(data, boundaries)

    def _encode_slice_segments(self, slice_type, slice_ranges):
        """Encode each slice segment as its own CABAC stream, with
        slice-boundary availability enforced through per-4x4 region ids
        (mirrors SliceDataParser's region4; tiles/WPP not combined with
        multi-slice yet)."""
        cfg = self.cfg
        assert not (self.tiles or self.wpp), \
            "multi-slice with tiles/WPP not supported"
        cs = cfg.ctb_size
        n4c = cs >> 2
        self.sao_params = np.zeros((cfg.ctbs_h, cfg.ctbs_w, 3, 6), np.int16)
        self.region_ctb = np.zeros((cfg.ctbs_h, cfg.ctbs_w), np.int32)
        self.region4 = np.zeros((self.h4, self.w4), np.int32)
        tile4_save = self.tile4
        self.tile4 = self.region4     # route avail_mask through regions
        if hasattr(self, "mvctx"):
            self.mvctx.set_region4(self.region4)
        out = []
        slice_no = -1
        prev_ctx = None
        for (start_ts, end_ts, dependent) in slice_ranges:
            if not dependent:
                slice_no += 1
            self._qp_reset_slice(dependent=bool(dependent))
            if not dependent:
                self.stat_coeff = [0, 0, 0, 0]
            bw = BitWriter()
            self.enc = SliceDataEncoder(bw, cfg, slice_type=slice_type,
                                        ctx=prev_ctx if dependent else None)
            for ts in range(start_ts, end_ts):
                rs = int(self.ts_order[ts])
                x0 = (rs % cfg.ctbs_w) * cs
                y0 = (rs // cfg.ctbs_w) * cs
                ry, rx = rs // cfg.ctbs_w, rs % cfg.ctbs_w
                self.region_ctb[ry, rx] = slice_no
                self.region4[ry * n4c:min((ry + 1) * n4c, self.h4),
                             rx * n4c:min((rx + 1) * n4c, self.w4)] = \
                    slice_no
                if cfg.sao_enabled:
                    self._encode_sao(rx, ry)
                self._quadtree(x0, y0, cfg.ctb_log2, 0)
                self.enc.terminate(1 if ts == end_ts - 1 else 0)
            bw.align_zero()
            prev_ctx = list(self.enc.ctx)
            out.append((bw.getvalue(), []))
        self.region4 = None
        self.region_ctb = None
        self.tile4 = tile4_save
        if hasattr(self, "mvctx"):
            self.mvctx.set_region4(None)
        return out

    @staticmethod
    def _escaped_offsets(data: bytes, boundaries):
        """entry_point_offsets (in coded/escaped bytes) from unescaped
        substream boundary positions (inverse of the un-escape fixup,
        hevc.c:3028-3058)."""
        if not boundaries:
            return []
        targets = sorted(set([0] + list(boundaries)))
        pos_map = {}
        zeros = 0
        epos = 0
        ti = 0
        for i, b in enumerate(data):
            while ti < len(targets) and targets[ti] == i:
                pos_map[i] = epos
                ti += 1
            if zeros >= 2 and b <= 3:
                epos += 1
                zeros = 0
            epos += 1
            zeros = zeros + 1 if b == 0 else 0
        while ti < len(targets) and targets[ti] == len(data):
            pos_map[len(data)] = epos
            ti += 1
        starts = [0] + [pos_map[b] for b in boundaries]
        return [starts[i + 1] - starts[i] for i in range(len(boundaries))]

    # ----- SAO parameters (random, mirrors SliceDataParser._sao_params) ---
    def _encode_sao(self, rx, ry):
        cfg, rng, enc = self.cfg, self.rng, self.enc
        sp = self.sao_params
        rc = self.region_ctb if self.region_ctb is not None else self.tile_id
        if rx > 0 and rc[ry, rx] == rc[ry, rx - 1]:
            merge = int(rng.random() < 0.2)
            enc.bin("sao_merge_flag", 0, merge)
            if merge:
                sp[ry, rx] = sp[ry, rx - 1]
                return
        if ry > 0 and rc[ry, rx] == rc[ry - 1, rx]:
            merge = int(rng.random() < 0.2)
            enc.bin("sao_merge_flag", 0, merge)
            if merge:
                sp[ry, rx] = sp[ry - 1, rx]
                return
        length = (1 << (min(cfg.bit_depth, 10) - 5)) - 1
        for c_idx in range(3):
            if c_idx == 2:
                sao_type = int(sp[ry, rx, 1, 0])
            else:
                sao_type = int(rng.integers(0, 3))
                enc.bin("sao_type_idx", 0, 1 if sao_type else 0)
                if sao_type:
                    enc.bypass(sao_type - 1)   # 0 -> band, 1 -> edge
            sp[ry, rx, c_idx, 0] = sao_type
            if sao_type == 0:
                continue
            offs = [int(rng.integers(0, length + 1)) for _ in range(4)]
            for v in offs:
                for _ in range(v):
                    enc.bypass(1)
                if v < length:
                    enc.bypass(0)
            if sao_type == 1:  # band
                for i in range(4):
                    if offs[i]:
                        sign = int(rng.random() < 0.5)
                        enc.bypass(sign)
                        if sign:
                            offs[i] = -offs[i]
                band_pos = int(rng.integers(0, 32))
                enc.bypass_bits(band_pos, 5)
                sp[ry, rx, c_idx, 1] = band_pos
            else:  # edge
                offs = offs[:2] + [-offs[2], -offs[3]]
                if c_idx == 2:
                    eo = int(sp[ry, rx, 1, 1])
                else:
                    eo = int(rng.integers(0, 4))
                    enc.bypass_bits(eo, 2)
                sp[ry, rx, c_idx, 1] = eo
            for i in range(4):
                sp[ry, rx, c_idx, 2 + i] = offs[i]

    # ----- coding tree ----------------------------------------------------
    def _quadtree(self, x0, y0, log2_cb, depth):
        cfg = self.cfg
        cb = 1 << log2_cb
        boundary = x0 + cb > cfg.width or y0 + cb > cfg.height
        can_split = log2_cb > cfg.min_cb_log2
        if boundary:
            split = 1 if can_split else 0
        elif can_split:
            split = int(self.rng.random() < 0.5)
            inc = 0
            x4, y4 = x0 >> 2, y0 >> 2
            if x0 > 0 and self._same_tile4(x4, y4, x4 - 1, y4) and \
                    self.ct_depth[y4, x4 - 1] > depth:
                inc += 1
            if y0 > 0 and self._same_tile4(x4, y4, x4, y4 - 1) and \
                    self.ct_depth[y4 - 1, x4] > depth:
                inc += 1
            self.enc.bin("split_cu_flag", inc, split)
        else:
            split = 0
        if self.qpd_on and \
                log2_cb >= cfg.ctb_log2 - cfg.cu_qp_delta_depth:
            # new quantization group: pick this QG's target delta
            self.is_qp_coded = 0
            self.qg_delta = 0
            self.emit_delta_value = None
            self.qg_target = int(self.rng.integers(-8, 9))
        if self.cqo_on and log2_cb >= cfg.ctb_log2 - \
                cfg.diff_cu_chroma_qp_offset_depth:
            # new chroma QG: pick this QG's cu_chroma_qp_offset
            # (emitted at its first chroma-cbf TU, hevc.c:1247-1263)
            n = len(cfg.chroma_qp_offset_list)
            if self.rng.random() < 0.75:
                idx = int(self.rng.integers(0, n))
                self.cqo_sel = (1, idx)
                self.cqo_cb, self.cqo_cr = cfg.chroma_qp_offset_list[idx]
            else:
                self.cqo_sel = (0, 0)
                self.cqo_cb = self.cqo_cr = 0
            self.cqo_emitted = False
        if split:
            h = cb >> 1
            for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
                x1, y1 = x0 + dx, y0 + dy
                if x1 < cfg.width and y1 < cfg.height:
                    self._quadtree(x1, y1, log2_cb - 1, depth + 1)
            if self.qpd_on and ((x0 + cb) & self.qg_mask) == 0 and \
                    ((y0 + cb) & self.qg_mask) == 0:
                self.qPy_pred = self.qp_y
        else:
            self._coding_unit(x0, y0, log2_cb, depth)

    def _coding_unit(self, x0, y0, log2_cb, depth):
        if not self.qpd_on:
            return self._coding_unit_body(x0, y0, log2_cb, depth)
        if not self.is_qp_coded:
            self.qp_try = self._qp_pred(x0, y0, self.qg_target,
                                        mutate=False)
        self._cu_has_cbf = False     # set by _tu_levels on nonzero levels
        self._cu_qp_base = (x0, y0)
        self._coding_unit_body(x0, y0, log2_cb, depth)
        # decoder-mirror CU tail (hevc.c:2489-2500)
        if not self.is_qp_coded:
            self._qp_pred(x0, y0, 0, mutate=True)
        cb = 1 << log2_cb
        x4, y4 = x0 >> 2, y0 >> 2
        n4 = cb >> 2
        self.qp_y4[y4:y4 + n4, x4:x4 + n4] = self.qp_y
        if ((x0 + cb) & self.qg_mask) == 0 and \
                ((y0 + cb) & self.qg_mask) == 0:
            self.qPy_pred = self.qp_y

    def _coding_unit_body(self, x0, y0, log2_cb, depth):
        cfg = self.cfg
        n4 = 1 << (log2_cb - 2)
        x4, y4 = x0 >> 2, y0 >> 2
        self.ct_depth[y4:y4 + n4, x4:x4 + n4] = depth
        self.cu_tqb = False
        if cfg.transquant_bypass:
            self.cu_tqb = bool(self.rng.random() < 0.3)
            self.enc.bin("cu_transquant_bypass_flag", 0,
                         1 if self.cu_tqb else 0)
        part_nxn = False
        if log2_cb == cfg.min_cb_log2:
            part_nxn = bool(self.rng.random() < 0.4)
            self.enc.bin("part_mode", 0, 0 if part_nxn else 1)
        if (cfg.pcm_enabled and not part_nxn and
                cfg.pcm_min_log2 <= log2_cb <= cfg.pcm_max_log2):
            use_pcm = bool(self.rng.random() < 0.2)
            self.enc.terminate(1 if use_pcm else 0)
            if use_pcm:
                self._pcm(x0, y0, log2_cb)
                return
        self._intra_cu(x0, y0, log2_cb, part_nxn)

    def _pcm(self, x0, y0, log2_cb):
        cb = 1 << log2_cb
        h, v = self.cfg.hshift1, self.cfg.vshift1
        ys = self.target[0][y0:y0 + cb, x0:x0 + cb]
        us = self.target[1][y0 >> v:(y0 + cb) >> v, x0 >> h:(x0 + cb) >> h]
        vs = self.target[2][y0 >> v:(y0 + cb) >> v, x0 >> h:(x0 + cb) >> h]
        self.enc.pcm_payload(ys, us, vs)
        self.recon[0][y0:y0 + cb, x0:x0 + cb] = ys
        self.recon[1][y0 >> v:(y0 + cb) >> v, x0 >> h:(x0 + cb) >> h] = us
        self.recon[2][y0 >> v:(y0 + cb) >> v, x0 >> h:(x0 + cb) >> h] = vs
        n4 = cb >> 2
        self.ipm[y0 >> 2:(y0 >> 2) + n4, x0 >> 2:(x0 >> 2) + n4] = 1

    # ----- intra CU -------------------------------------------------------
    def _intra_cu(self, x0, y0, log2_cb, part_nxn):
        cfg = self.cfg
        rng = self.rng
        self.cu_is_intra = True
        self.cu_x0, self.cu_y0, self.cu_log2 = x0, y0, log2_cb
        n_pu = 4 if part_nxn else 1
        pb = (1 << log2_cb) >> (1 if part_nxn else 0)
        modes = []
        flags = []
        mpm_data = []
        for i in range(n_pu):
            px = x0 + (i & 1) * pb
            py = y0 + (i >> 1) * pb
            mode = int(rng.integers(0, 35))
            cands = self._mpm_candidates(px, py)
            # store mode into grid immediately (next PU's cands use it)
            nn = pb >> 2
            self.ipm[py >> 2:(py >> 2) + nn, px >> 2:(px >> 2) + nn] = mode
            if mode in cands:
                flags.append(1)
                mpm_data.append(cands.index(mode))
            else:
                flags.append(0)
                rem = mode
                for c in sorted(cands, reverse=True):
                    if rem > c:
                        rem -= 1
                mpm_data.append(rem)
            modes.append(mode)
        for f in flags:
            self.enc.bin("prev_intra_luma_pred_flag", 0, f)
        for i in range(n_pu):
            if flags[i]:
                idx = mpm_data[i]
                self.enc.bypass(1 if idx > 0 else 0)
                if idx > 0:
                    self.enc.bypass(idx - 1)
            else:
                self.enc.bypass_bits(mpm_data[i], 5)
        # chroma mode: per PU in 4:4:4, single otherwise
        n_cpu = n_pu if cfg.chroma_format_idc == 3 else 1
        table = (0, 26, 10, 1)
        cmodes = []
        self.enc_chroma_idx_pu = []
        for i in range(n_cpu):
            chroma_idx = int(rng.integers(0, 5))
            self.enc_chroma_idx_pu.append(chroma_idx)
            if chroma_idx == 4:
                cmodes.append(modes[i])
                self.enc.bin("intra_chroma_pred_mode", 0, 0)
            else:
                m = table[chroma_idx]
                cmodes.append(34 if m == modes[i] else m)
                self.enc.bin("intra_chroma_pred_mode", 0, 1)
                self.enc.bypass_bits(chroma_idx, 2)
        if cfg.chroma_format_idc == 2:
            from ..bitstream.syntax import TAB_MODE_IDX_422
            cmodes = [TAB_MODE_IDX_422[m] for m in cmodes]
        self.cu_modes = (modes * 4)[:4]
        self.pu_modes_c = (cmodes * 4)[:4]
        self.enc_chroma_idx_pu = (self.enc_chroma_idx_pu * 4)[:4]
        self.mode_c = cmodes[0]
        # transform tree: plan splits, process (closed loop), then emit
        intra_split = 1 if part_nxn else 0
        max_depth = cfg.max_transform_hierarchy_depth + intra_split
        plan = self._plan_tree(x0, y0, log2_cb, 0, max_depth, intra_split)
        self._process_tree(plan, x0, y0, log2_cb, 0, 0)
        if self.qpd_on and self._cu_has_cbf and not self.is_qp_coded:
            # this CU carries the QG's cu_qp_delta (first coded TU locks)
            self.qg_delta = self.qg_target
            self.is_qp_coded = 1
            self.emit_delta_value = self.qg_target
            self._qp_pred(x0, y0, self.qg_delta, mutate=True)
        self._emit_tree(plan, x0, y0, x0, y0, log2_cb, 0, 0, (1, 1))

    def _mpm_candidates(self, px, py):
        cfg = self.cfg
        x4, y4 = px >> 2, py >> 2
        zc = self.zscan[y4, x4]
        cand_a = 1
        if px > 0 and self._same_tile4(x4, y4, x4 - 1, y4) and \
                self.zscan[y4, x4 - 1] < zc and \
                self.ipm[y4, x4 - 1] != 255:
            cand_a = int(self.ipm[y4, x4 - 1])
        cand_b = 1
        if py > 0 and (py % cfg.ctb_size) != 0 and \
                self._same_tile4(x4, y4, x4, y4 - 1) and \
                self.zscan[y4 - 1, x4] < zc and self.ipm[y4 - 1, x4] != 255:
            cand_b = int(self.ipm[y4 - 1, x4])
        if cand_a == cand_b:
            if cand_a < 2:
                return [0, 1, 26]
            return [cand_a, 2 + ((cand_a + 29) % 32), 2 + ((cand_a - 1) % 32)]
        lst = [cand_a, cand_b]
        if cand_a != 0 and cand_b != 0:
            lst.append(0)
        elif cand_a + cand_b < 2:
            lst.append(26)
        else:
            lst.append(1)
        return lst

    # ----- transform tree: plan / process / emit ---------------------------
    def _plan_tree(self, x0, y0, log2_tr, depth, max_depth, intra_split):
        cfg = self.cfg
        node = {"x": x0, "y": y0, "log2": log2_tr, "depth": depth}
        must_split = log2_tr > cfg.max_tb_log2 or (intra_split and depth == 0)
        may_split = (log2_tr > cfg.min_tb_log2 and depth < max_depth)
        split = must_split or (may_split and self.rng.random() < 0.4)
        node["split"] = split
        node["explicit_split"] = (may_split and not must_split and
                                  log2_tr <= cfg.max_tb_log2)
        if split:
            h = 1 << (log2_tr - 1)
            node["children"] = [
                self._plan_tree(x0 + dx, y0 + dy, log2_tr - 1, depth + 1,
                                max_depth, intra_split)
                for dx, dy in ((0, 0), (h, 0), (0, h), (h, h))]
        return node

    def _luma_mode_at(self, x, y):
        return int(self.ipm[y >> 2, x >> 2])

    def _enc_chroma_idx_at(self, x, y):
        pus = getattr(self, "enc_chroma_idx_pu", [4, 4, 4, 4])
        if self.cfg.chroma_format_idc == 3 and len(set(pus)) > 1:
            half = 1 << (self.cu_log2 - 1)
            bi = (2 if (y - self.cu_y0) >= half else 0) + \
                 (1 if (x - self.cu_x0) >= half else 0)
            return pus[bi]
        return pus[0]

    def _chroma_mode_at(self, x, y):
        """Per-PU chroma mode for 4:4:4 NxN (quadrant of the CU);
        otherwise the CU's single chroma mode."""
        cfg = self.cfg
        if cfg.chroma_format_idc == 3 and len(set(self.pu_modes_c)) > 1:
            half = 1 << (self.cu_log2 - 1)
            bi = (2 if (y - self.cu_y0) >= half else 0) + \
                 (1 if (x - self.cu_x0) >= half else 0)
            return self.pu_modes_c[bi]
        return self.mode_c

    pu_modes_c = [1, 1, 1, 1]
    cu_x0 = cu_y0 = 0
    cu_log2 = 4
    qpd_on = False
    qp_y4 = None
    _cu_has_cbf = False
    stat_coeff = [0, 0, 0, 0]

    def _pred_block(self, plane, x, y, size, mode):
        cfg = self.cfg
        hs = cfg.hshift1 if plane else 0
        vs = cfg.vshift1 if plane else 0
        av = avail_mask(self.zscan, self.pred_mode,
                        bool(cfg.constrained_intra), x, y, size,
                        hs, vs, cfg.width, cfg.height, tile4=self.tile4)
        return I.intra_predict_block(
            self.recon[plane], x, y, size, mode, av,
            is_luma=(plane == 0), bit_depth=cfg.bit_depth,
            filter_enabled=(plane == 0 or cfg.chroma_format_idc == 3),
            strong_smoothing=(cfg.strong_intra_smoothing and plane == 0))

    cu_is_intra = True   # PFrameEncoder toggles per CU
    cu_tqb = False       # cu_transquant_bypass for the current CU
    pred_buf = None      # inter CU prediction planes (MC output)

    def _tu_levels(self, plane, x, y, size, mode, cross=None):
        """Closed-loop: pred, transform+quant, recon update.
        Returns (levels, transform_skip_flag). cross: (res_scale,
        luma_residual) — RExt cross-component prediction: the scaled luma
        residual is removed from the coding target and restored in the
        reconstruction (hevc.c:1295-1362)."""
        cfg = self.cfg
        log2 = size.bit_length() - 1
        if self.cu_is_intra:
            pred = self._pred_block(plane, x, y, size, mode)
        else:
            pred = self.pred_buf[plane][y:y + size, x:x + size]
        resid = self.target[plane][y:y + size, x:x + size] - pred
        cross_add = 0
        if cross is not None and cross[0]:
            cross_add = (cross[0] * cross[1].astype(np.int64)) >> 3
            resid = resid - cross_add
        qp = self._tu_qp(plane)
        rd = None         # rdpcm direction the decoder will apply
        if self.cu_is_intra and mode in (10, 26):
            if self.cu_tqb and cfg.rext_implicit_rdpcm:
                rd = mode == 26
            elif (not self.cu_tqb) and cfg.rext_rotation and \
                    cfg.transform_skip:
                rd = mode == 26     # reference's TS gate (hevc_cabac:1887)
        if self.cu_tqb:
            # lossless: levels ARE the residual (DPCM'd when rdpcm applies)
            r_t = np.clip(resid, -32768, 32767).astype(np.int32)
            if rd is not None:
                d = np.diff(r_t, axis=0 if rd else 1,
                            prepend=np.zeros((1, size) if rd
                                             else (size, 1), np.int32))
                levels = np.clip(d, -32768, 32767).astype(np.int32)
                r_t = T.rdpcm(levels, rd)
            else:
                levels = r_t
            if np.any(levels):
                self._cu_has_cbf = True
            if plane == 0:
                self._last_luma_res = np.asarray(r_t, np.int64)
            rec = np.clip(pred + r_t, 0, (1 << cfg.bit_depth) - 1)
            self.recon[plane][y:y + size, x:x + size] = rec
            return levels, False
        ts = (cfg.transform_skip and size == 4 and
              bool(self.rng.random() < 0.5))
        # decoder-side dequant scaling matrix (hevc_cabac.c:1484 gate:
        # off for transform-skip TBs larger than 4x4)
        sm = None
        if self.scaling is not None and not (ts and log2 > 2):
            sm = self.scaling.matrix(log2,
                                     (0 if self.cu_is_intra else 3) + plane)
        if ts:
            # spatial-domain coding: forward shift mirrors the inverse
            # transform_skip scaling (15 - bd - log2)
            sh = 15 - cfg.bit_depth - log2
            src = resid
            if rd is not None and size == 4:
                src = np.diff(resid, axis=0 if rd else 1,
                              prepend=np.zeros((1, size) if rd
                                               else (size, 1), np.int64))
            coefs = src << sh if sh > 0 else src >> -sh
            levels = T.quantize(coefs, log2, qp, cfg.bit_depth)
            levels = np.clip(levels, -32768, 32767)
            if cfg.sign_data_hiding and \
                    not self._sdh_blocked(True, False, mode):
                # parity fix-up on the CODED domain (writer rotates
                # 4x4 intra TS blocks, hevc_cabac.c:1877)
                rot = (cfg.rext_rotation and log2 == 2 and
                       self.cu_is_intra)
                view = levels[::-1, ::-1] if rot else levels
                self._sdh_adjust(view, log2,
                                 self._scan_for(log2,
                                                0 if plane == 0 else 1,
                                                mode))
            if np.any(levels):
                self._cu_has_cbf = True
            d = T.dequant(levels, log2, qp, cfg.bit_depth, scaling=sm)
            rec_res = T.transform_skip(d, log2, cfg.bit_depth)
            if rd is not None and size == 4:
                rec_res = T.rdpcm(rec_res, rd)
            if not np.any(levels) and rd is None:
                rec_res = np.zeros((size, size), np.int64)
        else:
            is_dst = (plane == 0 and size == 4 and self.cu_is_intra)
            coefs = T.forward_transform(resid, cfg.bit_depth, is_dst=is_dst)
            levels = T.quantize(coefs, log2, qp, cfg.bit_depth)
            levels = np.clip(levels, -32768, 32767)
            if cfg.sign_data_hiding:
                self._sdh_adjust(levels, log2,
                                 self._scan_for(log2,
                                                0 if plane == 0 else 1,
                                                mode))
            if np.any(levels):
                self._cu_has_cbf = True
                d = T.dequant(levels, log2, qp, cfg.bit_depth, scaling=sm)
                rec_res = T.inverse_transform(d, cfg.bit_depth,
                                              is_dst=is_dst)
            else:
                rec_res = np.zeros((size, size), np.int64)
        if plane == 0:
            self._last_luma_res = np.asarray(rec_res, np.int64)
        if cross is not None and cross[0]:
            # reference accumulates into the int16 coeff buffer
            rec_res = np.asarray(rec_res + cross_add).astype(np.int16) \
                .astype(np.int64)
        rec = np.clip(pred + rec_res, 0, (1 << cfg.bit_depth) - 1)
        self.recon[plane][y:y + size, x:x + size] = rec
        return levels, ts

    def _tu_qp(self, plane):
        cfg = self.cfg
        base = self.qp_try if self.qpd_on else cfg.qp
        if plane == 0:
            return base
        off = 0
        if getattr(self, "cqo_on", False):
            off = self.cqo_cb if plane == 1 else self.cqo_cr
        return chroma_qp(base, off, cfg.chroma_format_idc, 0)

    def _process_tree(self, node, x_base, y_base, log2_cb, depth, blk_idx):
        """Decode-order closed loop, storing levels on the plan nodes."""
        if node["split"]:
            for i, ch in enumerate(node["children"]):
                self._process_tree(ch, node["x"], node["y"], log2_cb,
                                   depth + 1, i)
            # 4:2:0 aggregates chroma at the 8x8 parent of 4x4 luma TBs
            if node["log2"] == 3 and self.cfg.chroma_format_idc != 3:
                node["chroma_levels"] = self._chroma_tu(node["x"], node["y"],
                                                        4)
            return
        x0, y0, log2 = node["x"], node["y"], node["log2"]
        size = 1 << log2
        mode = self._luma_mode_at(x0, y0)
        node["luma_levels"], node["luma_ts"] = \
            self._tu_levels(0, x0, y0, size, mode)
        node["luma_mode"] = mode
        node["tqb"] = self.cu_tqb
        if self.cfg.chroma_format_idc == 3:
            cross = None
            cidx = self._enc_chroma_idx_at(x0, y0)
            if (self.cfg.cross_component and
                    np.any(node["luma_levels"]) and
                    ((not self.cu_is_intra) or cidx == 4)):
                pick = (0, 1, -1, 2, -4, 8, -8)
                cross = (int(self.rng.choice(pick)),
                         int(self.rng.choice(pick)))
            node["cross"] = cross
            node["chroma_levels"] = self._chroma_tu(
                x0, y0, size, cross=cross)
        elif log2 > 2:
            node["chroma_levels"] = self._chroma_tu(x0, y0, size >> 1)

    def _chroma_tu(self, x0, y0, csize, cross=None):
        """Returns ([(cb_levels, ts)], [(cr_levels, ts)]) — one entry per
        chroma TB (two stacked TBs in 4:2:2), closed-loop in decode
        order (all cb TBs then all cr TBs, hevc.c:1302/1335). cross:
        (scale_cb, scale_cr) for RExt cross-component prediction."""
        h, v = self.cfg.hshift1, self.cfg.vshift1
        n_c = 2 if self.cfg.chroma_format_idc == 2 else 1
        mc = self._chroma_mode_at(x0, y0) if self.cu_is_intra else -1
        ylr = getattr(self, "_last_luma_res", None)
        xc = (None if cross is None else (cross[0], ylr),
              None if cross is None else (cross[1], ylr))
        cbs = [self._tu_levels(1, x0 >> h, (y0 >> v) + i * csize, csize,
                               mc, cross=xc[0])
               for i in range(n_c)]
        crs = [self._tu_levels(2, x0 >> h, (y0 >> v) + i * csize, csize,
                               mc, cross=xc[1])
               for i in range(n_c)]
        return (cbs, crs)

    def _emit_tree(self, node, x0, y0, x_base, y_base, log2_tr, depth,
                   blk_idx, parent_cbf):
        cfg = self.cfg
        if node["explicit_split"]:
            self.enc.bin("split_transform_flag", 5 - log2_tr,
                         1 if node["split"] else 0)
        cbf_cb_p, cbf_cr_p = parent_cbf
        cbf_cb = cbf_cr = (0, 0)
        is422 = cfg.chroma_format_idc == 2
        split = node["split"]
        if log2_tr > 2 or cfg.chroma_format_idc == 3:
            cbf_cb, cbf_cr = self._subtree_chroma_cbf(node)
            if depth == 0 or cbf_cb_p[0]:
                self.enc.bin("cbf_cbcr", depth, cbf_cb[0])
                if is422 and (not split or log2_tr == 3):
                    self.enc.bin("cbf_cbcr", depth, cbf_cb[1])
            if depth == 0 or cbf_cr_p[0]:
                self.enc.bin("cbf_cbcr", depth, cbf_cr[0])
                if is422 and (not split or log2_tr == 3):
                    self.enc.bin("cbf_cbcr", depth, cbf_cr[1])
        if split:
            for i, ch in enumerate(node["children"]):
                self._emit_tree(ch, ch["x"], ch["y"], node["x"], node["y"],
                                log2_tr - 1, depth + 1, i, (cbf_cb, cbf_cr))
            return
        luma = node["luma_levels"]
        cbf_luma = int(np.any(luma))
        # explicit unless inferred 1 (inter, depth 0, no chroma cbf)
        if self.cu_is_intra or depth != 0 or any(cbf_cb) or any(cbf_cr):
            self.enc.bin("cbf_luma", 0 if depth else 1, cbf_luma)
        else:
            assert cbf_luma, "inferred cbf_luma=1 requires nonzero levels"
        # transform_unit emission
        eff_cb = cbf_cb if (log2_tr > 2 or
                            cfg.chroma_format_idc == 3) else cbf_cb_p
        eff_cr = cbf_cr if (log2_tr > 2 or
                            cfg.chroma_format_idc == 3) else cbf_cr_p
        cbf_chroma = (eff_cb[0] or eff_cr[0] or
                      (is422 and (eff_cb[1] or eff_cr[1])))
        if self.qpd_on and self.emit_delta_value is not None:
            if cbf_luma or cbf_chroma:
                self._emit_cu_qp_delta(self.emit_delta_value)
                self.emit_delta_value = None
        if getattr(self, "cqo_on", False) and not self.cqo_emitted and \
                cbf_chroma and not node.get("tqb", False):
            # cu_chroma_qp_offset_flag/_idx (hevc.c:1247-1263)
            flag, idx = self.cqo_sel
            self.enc.bin("cu_chroma_qp_offset_flag", 0, flag)
            if flag and len(cfg.chroma_qp_offset_list) > 1:
                # cMax = max(5, len-1): hevc_cabac.c:768 quirk
                n = max(5, len(cfg.chroma_qp_offset_list) - 1)
                for _ in range(idx):
                    self.enc.bin("cu_chroma_qp_offset_idx", 0, 1)
                if idx < n:
                    self.enc.bin("cu_chroma_qp_offset_idx", 0, 0)
            self.cqo_emitted = True
        mode = node["luma_mode"]
        if cbf_luma:
            scan = self._scan_for(log2_tr, 0, mode)
            lts = node.get("luma_ts", False)
            ltqb = node.get("tqb", False)
            self._encode_residual(luma, log2_tr, 0, scan,
                                  ts=lts, tqb=ltqb,
                                  sdh_ok=not self._sdh_blocked(lts, ltqb,
                                                               mode))
        if log2_tr > 2 or cfg.chroma_format_idc == 3:
            clog2 = log2_tr - cfg.hshift1
            self._emit_chroma(node["chroma_levels"], clog2,
                              self._chroma_mode_at(node["x"], node["y"])
                              if self.cu_is_intra else -1,
                              node.get("tqb", False),
                              cross=node.get("cross"))
        elif blk_idx == 3:
            self._emit_chroma(self._find_parent(x_base, y_base), 2,
                              self.mode_c if self.cu_is_intra else -1,
                              node.get("tqb", False))

    def _emit_chroma(self, chroma_levels, clog2, mc, tqb, cross=None):
        cbs, crs = chroma_levels
        scan = self._scan_for(clog2, 1, mc)
        for plane, tbs in ((1, cbs), (2, crs)):
            if cross is not None:
                self._emit_res_scale(plane - 1, cross[plane - 1])
            for (lvl, tsf) in tbs:
                if np.any(lvl):
                    self._encode_residual(
                        lvl, clog2, plane, scan, ts=tsf, tqb=tqb,
                        sdh_ok=not self._sdh_blocked(tsf, tqb, mc))

    def _emit_res_scale(self, idx, v):
        """log2_res_scale_abs_plus1 (TU, 4 ctx per comp) + sign
        (hls_cross_component_pred inverse, hevc.c:1150)."""
        enc = self.enc
        k = abs(v).bit_length()      # v = +-2^(k-1), 0 -> no scale
        for j in range(k):
            enc.bin("log2_res_scale_abs", 4 * idx + j, 1)
        if k < 4:
            enc.bin("log2_res_scale_abs", 4 * idx + k, 0)
        if v:
            enc.bin("res_scale_sign_flag", idx, 1 if v < 0 else 0)

    def _find_parent(self, x_base, y_base):
        # located chroma levels stored during process at the 8x8 parent
        return self._parent_chroma[(x_base, y_base)]

    def _subtree_chroma_cbf(self, node):
        """((cbf_cb0, cbf_cb1), (cbf_cr0, cbf_cr1)): per-TB values at
        leaves / aggregated 8x8 nodes; at higher split nodes only [0] is
        coded and it gates the whole subtree, so it ORs everything."""
        def pair(tbs):
            v = [int(np.any(lvl)) for (lvl, _ts) in tbs]
            return (v[0], v[1] if len(v) > 1 else 0)
        if not node["split"]:
            cbs, crs = node["chroma_levels"]
            return pair(cbs), pair(crs)
        if node["log2"] == 3 and self.cfg.chroma_format_idc != 3:
            cbs, crs = node["chroma_levels"]
            self._parent_chroma[(node["x"], node["y"])] = \
                node["chroma_levels"]
            return pair(cbs), pair(crs)
        a = [self._subtree_chroma_cbf(ch) for ch in node["children"]]
        return ((int(any(any(x[0]) for x in a)), 0),
                (int(any(any(x[1]) for x in a)), 0))

    def _scan_for(self, log2_tr, c_idx, mode):
        cfg = self.cfg
        if self.cu_is_intra and (
                log2_tr == 2 or (log2_tr == 3 and c_idx == 0) or
                (log2_tr == 3 and cfg.chroma_format_idc == 3)):
            if 6 <= mode <= 14:
                return SCAN_VERT
            if 22 <= mode <= 30:
                return SCAN_HORIZ
        return SCAN_DIAG

    def _sdh_blocked(self, ts, tqb, mode):
        """Mirror of the decoder's sign_hidden=0 gate
        (hevc_cabac.c:1748-1753): transquant bypass, or the
        implicit-RDPCM intra TS modes. (Explicit RDPCM is never emitted
        by this encoder.)"""
        if tqb:
            return True
        return (self.cu_is_intra and ts and mode in (10, 26) and
                self.cfg.rext_implicit_rdpcm)

    def _sdh_adjust(self, levels, log2_tr, scan_idx):
        """Sign-data-hiding parity fix-up on the CODED level array
        (rotated domain for rotated TS blocks): for every 4x4 CG whose
        first/last significant scan positions span >= 4, the sign of
        the first-in-scan coefficient is inferred by the decoder from
        sum-of-abs parity — adjust the last-in-scan coefficient's
        magnitude by one when the parity disagrees. Mutates and
        returns `levels`."""
        size = 1 << log2_tr
        ncg = max(1, size >> 2)
        cg_scan = _CG_SCANS[(scan_idx, ncg)] if ncg > 1 else [(0, 0)]
        off_scan = _SCANS_4[scan_idx]
        for (x_cg, y_cg) in cg_scan:
            nzs = []
            for n, (ox, oy) in enumerate(off_scan):
                x, y = (x_cg << 2) + ox, (y_cg << 2) + oy
                if levels[y, x] != 0:
                    nzs.append((n, x, y))
            if len(nzs) < 2 or nzs[-1][0] - nzs[0][0] < 4:
                continue
            s = sum(abs(int(levels[y, x])) for (_n, x, y) in nzs)
            _n0, fx, fy = nzs[0]
            want_odd = levels[fy, fx] < 0
            if bool(s & 1) != want_odd:
                _nl, lx_, ly_ = nzs[-1]
                v = int(levels[ly_, lx_])
                if abs(v) > 1:
                    levels[ly_, lx_] = v - 1 if v > 0 else v + 1
                else:
                    levels[ly_, lx_] = v + 1 if v > 0 else v - 1
        return levels

    # ----- residual CABAC encoding ----------------------------------------
    def _encode_residual(self, levels, log2_tr, c_idx, scan_idx,
                         ts=False, tqb=False, sdh_ok=False):
        enc = self.enc
        cfg = self.cfg
        if (not tqb and cfg.transform_skip and
                log2_tr <= 2):  # pps log2_max_transform_skip default 4x4
            enc.bin("transform_skip_flag", 1 if c_idx else 0, 1 if ts else 0)
        if (cfg.rext_rotation and ts and log2_tr == 2 and
                self.cu_is_intra):
            # decoder un-rotates 4x4 intra TS blocks (hevc_cabac.c:1877)
            levels = levels[::-1, ::-1]
        size = 1 << log2_tr
        ncg = max(1, size >> 2)
        cg_scan = _CG_SCANS[(scan_idx, ncg)] if ncg > 1 else [(0, 0)]
        off_scan = _SCANS_4[scan_idx]
        # build full scan order list of (x,y)
        order = []
        for (xc_g, yc_g) in cg_scan:
            for (ox, oy) in off_scan:
                order.append(((xc_g << 2) + ox, (yc_g << 2) + oy))
        nz = [i for i, (x, y) in enumerate(order) if levels[y, x] != 0]
        assert nz, "cbf=1 with all-zero levels"
        num_coeff = nz[-1] + 1
        last_x, last_y = order[num_coeff - 1]
        lx, ly = (last_y, last_x) if scan_idx == SCAN_VERT else (last_x, last_y)
        self._encode_last_prefix(lx, c_idx, log2_tr, "last_sig_coeff_x_prefix")
        self._encode_last_prefix(ly, c_idx, log2_tr, "last_sig_coeff_y_prefix")
        for v in (lx, ly):
            if v > 3:
                p = self._group_idx(v)
                n = (p >> 1) - 1
                suffix = v - self._min_in_group(p)
                enc.bypass_bits(suffix, n)
        num_last_subset = (num_coeff - 1) >> 4
        csbf = np.zeros((8, 8), np.uint8)
        # precompute per-subset nonzero presence
        sub_has = [any(levels[order[i << 4 | k][1], order[i << 4 | k][0]] != 0
                       for k in range(16) if (i << 4 | k) < num_coeff)
                   for i in range(ncg * ncg)]
        g1_carry = 1
        for i in range(num_last_subset, -1, -1):
            x_cg, y_cg = cg_scan[i]
            coded = 1 if sub_has[i] else 0
            if i < num_last_subset and i > 0:
                ctx_cg = 0
                if x_cg < ncg - 1:
                    ctx_cg += csbf[x_cg + 1, y_cg]
                if y_cg < ncg - 1:
                    ctx_cg += csbf[x_cg, y_cg + 1]
                inc = min(int(ctx_cg), 1) + (2 if c_idx else 0)
                enc.bin("coded_sub_block_flag", inc, coded)
                csbf[x_cg, y_cg] = coded
                implicit_nz = 1
            else:
                csbf[x_cg, y_cg] = 1
                implicit_nz = 0
                coded = 1
            if not coded:
                continue
            offset = i << 4
            last_scan_pos = num_coeff - offset - 1
            sig_idx = []
            if i == num_last_subset:
                n_end = last_scan_pos - 1
                sig_idx.append(last_scan_pos)
                implicit_nz = 0
            else:
                n_end = 15
            prev_sig = 0
            if x_cg < (size - 1) >> 2:
                prev_sig = int(csbf[x_cg + 1, y_cg])
            if y_cg < (size - 1) >> 2:
                prev_sig += int(csbf[x_cg, y_cg + 1]) << 1
            if n_end >= 0:
                map_row, base_off = self._sig_ctx_base(c_idx, log2_tr,
                                                       scan_idx, x_cg, y_cg,
                                                       prev_sig)
                for n in range(n_end, 0, -1):
                    xc, yc = off_scan[n]
                    gx, gy = (x_cg << 2) + xc, (y_cg << 2) + yc
                    sig = int(levels[gy, gx] != 0)
                    inc = SIG_CTX_MAP[map_row][(yc << 2) + xc] + base_off
                    enc.bin("sig_coeff_flag", inc, sig)
                    if sig:
                        sig_idx.append(n)
                        implicit_nz = 0
                gx, gy = x_cg << 2, y_cg << 2
                dc_sig = int(levels[gy, gx] != 0)
                if implicit_nz == 0:
                    if i == 0:
                        dc_off = 0 if c_idx == 0 else 27
                    else:
                        dc_off = 2 + base_off
                    enc.bin("sig_coeff_flag", dc_off, dc_sig)
                    if dc_sig:
                        sig_idx.append(0)
                else:
                    assert dc_sig, "inferred DC must be nonzero"
                    sig_idx.append(0)
            n_sig = len(sig_idx)
            if n_sig == 0:
                continue
            vals = []
            for n in sig_idx:
                xc, yc = off_scan[n]
                vals.append(int(levels[(y_cg << 2) + yc, (x_cg << 2) + xc]))
            ctx_set = 2 if (i > 0 and c_idx == 0) else 0
            if i != num_last_subset and g1_carry == 0:
                ctx_set += 1
            g1 = 1
            first_g1 = -1
            gt1 = []
            for m in range(min(n_sig, 8)):
                f = int(abs(vals[m]) > 1)
                inc = (ctx_set << 2) + g1 + (16 if c_idx else 0)
                enc.bin("coeff_abs_level_greater1_flag", inc, f)
                gt1.append(f)
                if f:
                    g1 = 0
                    if first_g1 == -1:
                        first_g1 = m
                elif 0 < g1 < 3:
                    g1 += 1
            g1_carry = g1
            if first_g1 != -1:
                f2 = int(abs(vals[first_g1]) > 2)
                inc = ctx_set + (4 if c_idx else 0)
                enc.bin("coeff_abs_level_greater2_flag", inc, f2)
            # signs; with sign-data hiding the first-in-scan coeff's
            # sign (LAST in vals' decode order) is inferred from
            # sum-of-abs parity (hevc_cabac.c:1758-1763, :1810)
            hidden = (sdh_ok and cfg.sign_data_hiding and
                      sig_idx[0] - sig_idx[-1] >= 4)
            if hidden:
                self.sdh_hidden_signs += 1   # coverage counter (tests)
                assert (sum(abs(v) for v in vals) & 1) == \
                    (1 if vals[-1] < 0 else 0), \
                    "SDH parity not established by _sdh_adjust"
            for vv in (vals[:-1] if hidden else vals):
                enc.bypass(1 if vv < 0 else 0)
            price = cfg.rext_persistent_rice
            if price:
                sb_type = 2 * (1 if c_idx == 0 else 0) + \
                    (1 if (ts or tqb) else 0)
                rice = self.stat_coeff[sb_type] >> 2
            else:
                rice = 0
            rice_init = [False]

            def bump(rem):
                if price and not rice_init[0]:
                    r0 = self.stat_coeff[sb_type] >> 2
                    if rem >= (3 << r0):
                        self.stat_coeff[sb_type] += 1
                    elif 2 * rem < (1 << r0) and self.stat_coeff[sb_type]:
                        self.stat_coeff[sb_type] -= 1
                    rice_init[0] = True

            for m in range(n_sig):
                a = abs(vals[m])
                if m < 8:
                    base = 1 + (1 if a > 1 else 0)
                    if m == first_g1:
                        base += (1 if a > 2 else 0)
                    threshold = 3 if m == first_g1 else 2
                    if base == threshold:
                        rem = a - base
                        self._encode_remaining(rem, rice)
                        if a > (3 << rice):
                            rice = rice + 1 if price else min(rice + 1, 4)
                        bump(rem)
                else:
                    rem = a - 1
                    self._encode_remaining(rem, rice)
                    if a > (3 << rice):
                        rice = rice + 1 if price else min(rice + 1, 4)
                    bump(rem)

    def _sig_ctx_base(self, c_idx, log2_tr, scan_idx, x_cg, y_cg, prev_sig):
        if c_idx == 0:
            base_off = 0
            if log2_tr == 2:
                return 0, 0
            map_row = prev_sig + 1
            if x_cg > 0 or y_cg > 0:
                base_off += 3
            base_off += (9 if scan_idx == SCAN_DIAG else 15) \
                if log2_tr == 3 else 21
            return map_row, base_off
        base_off = 27
        if log2_tr == 2:
            return 0, base_off
        map_row = prev_sig + 1
        base_off += 9 if log2_tr == 3 else 12
        return map_row, base_off

    @staticmethod
    def _min_in_group(p):
        return p if p < 4 else (2 + (p & 1)) << ((p >> 1) - 1)

    def _group_idx(self, v):
        p = 0
        while self._min_in_group(p + 1) <= v:
            p += 1
            if p >= 31:
                break
        return p

    def _encode_last_prefix(self, v, c_idx, log2_tr, elem):
        if c_idx == 0:
            ctx_offset = 3 * (log2_tr - 2) + ((log2_tr - 1) >> 2)
            ctx_shift = (log2_tr + 1) >> 2
        else:
            ctx_offset = 15
            ctx_shift = log2_tr - 2
        p = self._group_idx(v)
        mx = (log2_tr << 1) - 1
        for i in range(p):
            self.enc.bin(elem, (i >> ctx_shift) + ctx_offset, 1)
        if p < mx:
            self.enc.bin(elem, (p >> ctx_shift) + ctx_offset, 0)

    def _encode_remaining(self, r, rice):
        enc = self.enc
        if r < (3 << rice):
            p = r >> rice
            for _ in range(p):
                enc.bypass(1)
            enc.bypass(0)
            if rice:
                enc.bypass_bits(r & ((1 << rice) - 1), rice)
        else:
            pm3 = 0
            while ((1 << (pm3 + 1)) + 2) << rice <= r:
                pm3 += 1
            for _ in range(3 + pm3):
                enc.bypass(1)
            enc.bypass(0)
            suffix = r - (((1 << pm3) + 2) << rice)
            enc.bypass_bits(suffix, pm3 + rice)

    # storage for blkIdx==3 chroma
    _parent_chroma: dict = {}


def encode_intra_stream(frames, width, height, qp=30, ctb_log2=4,
                        min_cb_log2=3, max_tb_log2=None, seed=0,
                        pcm=False, sao=False, deblock=False,
                        beta_offset_div2=0, tc_offset_div2=0,
                        pcm_loop_filter_disabled=None, bit_depth=8,
                        transform_skip=False, transquant_bypass=False,
                        md5_sei=False, wpp=False, tile_cols=1,
                        tile_rows=1, tile_widths=None, tile_heights=None,
                        chroma_format_idc=1,
                        scaling_list=None, num_slices=1,
                        dependent_slices=False,
                        cu_qp_delta_depth=None, rext_rotation=False,
                        rext_implicit_rdpcm=False,
                        rext_persistent_rice=False,
                        cross_component=False, vui_timing=False,
                        chroma_qp_offset_list=None,
                        diff_cu_chroma_qp_offset_depth=0,
                        sign_data_hiding=False) -> bytes:
    # NOTE: the reference decoder never clears its is_pcm no-filter map
    # across frames (hevc_frame_start memsets bs/cbf but not is_pcm), so
    # multi-frame streams combining PCM + pcm_loop_filter_disabled + loop
    # filters decode differently there than the spec prescribes. Default to
    # the interoperable setting when filters are on.
    if pcm_loop_filter_disabled is None:
        pcm_loop_filter_disabled = not (sao or deblock)
    cfg = EncoderConfig(width=width, height=height, qp=qp,
                        bit_depth=bit_depth,
                        chroma_format_idc=chroma_format_idc,
                        pcm_bit_depth=min(bit_depth, 8) if pcm else 8,
                        ctb_log2=ctb_log2, min_cb_log2=min_cb_log2,
                        min_tb_log2=2,
                        max_tb_log2=max_tb_log2 or min(5, ctb_log2),
                        max_transform_hierarchy_depth=2,
                        pcm_enabled=pcm,
                        pcm_min_log2=max(3, min_cb_log2),
                        pcm_max_log2=max(3, min_cb_log2),
                        pcm_loop_filter_disabled=pcm_loop_filter_disabled,
                        sao_enabled=sao, deblock_disabled=not deblock,
                        beta_offset_div2=beta_offset_div2,
                        tc_offset_div2=tc_offset_div2,
                        transform_skip=transform_skip,
                        transquant_bypass=transquant_bypass,
                        wpp=wpp, tile_cols=tile_cols,
                        tile_widths=tile_widths,
                        tile_heights=tile_heights, tile_rows=tile_rows,
                        scaling_list=scaling_list,
                        dependent_slices=dependent_slices,
                        cu_qp_delta_depth=cu_qp_delta_depth,
                        rext_rotation=rext_rotation,
                        rext_implicit_rdpcm=rext_implicit_rdpcm,
                        rext_persistent_rice=rext_persistent_rice,
                        cross_component=cross_component,
                        chroma_qp_offset_list=chroma_qp_offset_list,
                        diff_cu_chroma_qp_offset_depth=(
                            diff_cu_chroma_qp_offset_depth),
                        vui_timing=vui_timing,
                        sign_data_hiding=sign_data_hiding)
    rng = np.random.default_rng(seed)
    out = write_vps(cfg) + write_sps(cfg) + write_pps(cfg)
    enc = IntraFrameEncoder(cfg, rng)
    recons = []
    for (y, u, v) in frames:
        enc._parent_chroma = {}
        out += enc.encode_frame(y, u, v, num_slices=num_slices,
                                dependent=dependent_slices)
        recons.append([p.copy() for p in enc.recon])
        if md5_sei:
            assert not (sao or deblock), \
                "md5_sei needs the final (filtered) picture; filters off only"
            from ..bitstream.sei import write_picture_hash_sei
            out += write_picture_hash_sei(enc.recon, bit_depth)
    return out, recons
