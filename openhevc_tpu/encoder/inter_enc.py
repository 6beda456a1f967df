"""P-slice encoder (inter test-stream generator).

Extends the intra encoder with skip / merge / AMVP CUs over one reference
frame. MV candidate lists are derived with the same shared module the
decoder uses (bitstream/mvs.py) — the encoder chooses indices, the decoder
re-derives the same lists; prediction runs through the decoder's exact MC
ops (ops/mc_np.py). Coverage: cu_skip_flag, merge_flag/idx, ref_idx, mvd
coding, mvp flags, part 2Nx2N/2NxN/Nx2N(/NxN at min), rqt_root_cbf,
inter TU trees, intra CUs inside P slices.
"""
from __future__ import annotations

import numpy as np

from ..bitstream.bits import BitWriter, wrap_nal
from ..bitstream.mvs import MotionContext, MvField, PF_L0
from ..bitstream.syntax import zscan_grid
from ..ops import mc_np
from ..symbols import InterPb
from .hevc_enc import (EncoderConfig, SliceDataEncoder, write_vps, write_sps,
                       write_pps, write_slice_header, NAL_IDR_N_LP,
                       NAL_TRAIL_R)
from .intra_enc import IntraFrameEncoder, _Sps


class PFrameEncoder(IntraFrameEncoder):
    num_st_rps = 1

    def encode_frame_p(self, y, u, v, poc, ref_pics, nal_type=NAL_TRAIL_R,
                       slice_type=1, num_slices=1, dependent=False,
                       lt_entries=None, ref_pics_l1=None,
                       st_rps_idx_ovr=None):
        """ref_pics: [(poc, [Y,Cb,Cr])] or [(poc, planes, is_lt)] in L0
        order. slice_type 1=P, 0=B (L1 == L0 low-delay unless
        ref_pics_l1 gives a distinct list — the random-access pyramid
        path). lt_entries: slice-header long-term list
        [(poc_lsb, used, msb_cycle|None)] matching the is_lt refs.
        st_rps_idx_ovr: explicit SPS RPS index (RA streams carry one
        RPS per pyramid position)."""
        cfg = self.cfg
        self.target = [np.asarray(y, np.int64), np.asarray(u, np.int64),
                       np.asarray(v, np.int64)]
        W, H = cfg.width, cfg.height
        hs, vs = cfg.hshift1, cfg.vshift1
        self.recon = [np.zeros((H, W), np.int64),
                      np.zeros((H >> vs, W >> hs), np.int64),
                      np.zeros((H >> vs, W >> hs), np.int64)]
        self.ipm = np.full((self.h4, self.w4), 255, np.uint8)
        self.pred_mode = np.zeros((self.h4, self.w4), np.uint8)
        self.ct_depth = np.zeros((self.h4, self.w4), np.int8)
        self.skip_grid = np.zeros((self.h4, self.w4), np.uint8)
        norm = [(e[0], e[1], (e[2] if len(e) > 2 else self.ref_lt))
                for e in ref_pics]
        self.ref_planes = {p: pl for p, pl, _ in norm}
        l0 = [(p, lt) for p, _, lt in norm]
        list_mod = None
        nptc = 0
        if cfg.lists_modification and len(l0) > 1 and \
                ref_pics_l1 is None and not cfg.lt_ref:
            # ref_pic_list_modification (hevc.c:520; 7.3.6.2): rotate
            # the candidate list by one. Low-delay only — there the
            # decoder's candidate set (ST-before + after + LT) equals
            # the default L0/L1, so NumPicsTotalCurr == len(l0) and
            # the rotated list_entry values reproduce this encoder's
            # reordered list exactly.
            n = len(l0)
            nptc = n
            ents = [(i + 1) % n for i in range(n)]
            l0 = l0[1:] + l0[:1]
            list_mod = (ents, ents if slice_type == 0 else None)
        if slice_type == 0 and ref_pics_l1 is not None:
            norm1 = [(e[0], e[1], (e[2] if len(e) > 2 else self.ref_lt))
                     for e in ref_pics_l1]
            self.ref_planes.update({p: pl for p, pl, _ in norm1})
            l1 = [(p, lt) for p, _, lt in norm1]
        else:
            l1 = list(l0)
        ref_list = [l0, l1 if slice_type == 0 else []]
        self.slice_type = slice_type
        self.mvctx = MotionContext(_Sps2(cfg), self.zscan, poc, slice_type,
                                   cfg.max_merge_cand, ref_list)
        if cfg.temporal_mvp and ref_pics:
            # collocated = L0[collocated_idx] (collocated_from_l0=1)
            ci = min(self.collocated_idx, len(l0) - 1)
            col_poc = l0[ci][0]
            cm = self._motion_store.get(col_poc)
            if cm is not None:
                self.mvctx.set_col_motion(col_poc, cm[0], cm[1], cm[2],
                                          colloc_from_l0=1,
                                          lt_map=cm[3]
                                          if len(cm) > 3 else None)
        self.is_p = True
        self.weight_table = None
        if cfg.weighted_pred:
            self.weight_table = self._gen_weight_table(len(ref_pics),
                                                       slice_type)
        n_st = sum(1 for e in ref_pics if len(e) <= 2 or not e[2])
        if st_rps_idx_ovr is not None:
            rps_idx = st_rps_idx_ovr
        elif self.st_rps_idx is not None:
            rps_idx = self.st_rps_idx
        else:
            rps_idx = max(n_st - 1, 0)
        hdr_kw = dict(lt_entries=lt_entries,
                      st_rps_idx=rps_idx,
                      num_ref_l0=self.num_ref_l0 or len(ref_pics),
                      num_ref_l1=self.num_ref_l0 or len(l1),
                      weight_table=self.weight_table,
                      collocated_ref_idx=self.collocated_idx,
                      list_mod=list_mod,
                      num_pics_total_curr=nptc)
        if num_slices > 1:
            return self._encode_frame_sliced(nal_type, poc,
                                             self.num_st_rps, num_slices,
                                             dependent, slice_type,
                                             **hdr_kw)
        data, eps = self._encode_slice_data(slice_type=slice_type)
        bw = BitWriter()
        write_slice_header(bw, cfg, nal_type, slice_type=slice_type, poc=poc,
                           num_st_rps=self.num_st_rps,
                           entry_point_offsets=eps,
                           pps_id=self.pps_id,
                           inter_layer_pred=self.inter_layer_pred,
                           **hdr_kw)
        return wrap_nal(nal_type, bw.getvalue() + data,
                        layer_id=self.layer_id,
                        temporal_id=self.temporal_id)

    st_rps_idx = None     # override (SHVC EL uses the empty RPS)
    num_ref_l0 = None     # override for IL-only reference lists
    ref_lt = False        # mark refs long-term (SHVC inter-layer ref)
    collocated_idx = 0    # collocated_ref_idx in L0 (SHVC: point at IL)

    def _gen_weight_table(self, n_refs, slice_type):
        """Random explicit weights per ref (the conformance generator's
        role: exercise the weighted uni/bi MC paths)."""
        rng = self.rng
        dn = int(rng.integers(4, 7))
        dnc = max(0, min(7, dn + int(rng.integers(-1, 2))))
        wt = {"luma_log2_denom": dn, "chroma_log2_denom": dnc}
        for lx in ("l0", "l1"):
            entries = []
            for _ in range(n_refs):
                lw = (1 << dn) + int(rng.integers(-10, 11))
                lo = int(rng.integers(-20, 21))
                cw = [(1 << dnc) + int(rng.integers(-10, 11))
                      for _ in range(2)]
                co = [int(rng.integers(-20, 21)) for _ in range(2)]
                entries.append((lw, lo, cw, co))
            wt[lx] = entries
            if slice_type != 0:
                break
        return wt

    # ----- CU dispatch ------------------------------------------------------
    def _coding_unit(self, x0, y0, log2_cb, depth):
        if not getattr(self, "is_p", False):
            return super()._coding_unit(x0, y0, log2_cb, depth)
        cfg, rng, enc = self.cfg, self.rng, self.enc
        n4 = 1 << (log2_cb - 2)
        x4, y4 = x0 >> 2, y0 >> 2
        self.ct_depth[y4:y4 + n4, x4:x4 + n4] = depth
        self.cu_depth = depth
        self.cu_tqb = False
        ctb = 1 << cfg.ctb_log2
        if x0 % ctb == 0 and y0 % ctb == 0:
            self._ctb_saw_il = False
        force_il = self.il_every_ctb and not self._ctb_saw_il
        # skip flag
        skip = (not force_il) and rng.random() < 0.3
        inc = 0
        if x0 > 0 and self._same_tile4(x4, y4, x4 - 1, y4) and \
                self.skip_grid[y4, x4 - 1]:
            inc += 1
        if y0 > 0 and self._same_tile4(x4, y4, x4, y4 - 1) and \
                self.skip_grid[y4 - 1, x4]:
            inc += 1
        enc.bin("cu_skip_flag", inc, 1 if skip else 0)
        if skip:
            self.skip_grid[y4:y4 + n4, x4:x4 + n4] = 1
            self.pred_mode[y4:y4 + n4, x4:x4 + n4] = 0
            cb = 1 << log2_cb
            merge_idx = int(rng.integers(0, cfg.max_merge_cand))
            self._encode_merge_idx(merge_idx)
            f = self.mvctx.merge_mode(x0, y0, cb, cb, log2_cb, 0, 0,
                                      merge_idx, x0, y0)
            self._apply_inter_pu(x0, y0, cb, cb, f)
            # recon = pred (no residual)
            pb = self._pred_buf_for(x0, y0, cb, cb)
            for c in range(3):
                sh = 1 if c else 0
                xs, ys = x0 >> sh, y0 >> sh
                ss = cb >> sh
                self.recon[c][ys:ys + ss, xs:xs + ss] = \
                    pb[c][ys:ys + ss, xs:xs + ss]
            return
        intra = (not force_il) and rng.random() < 0.25
        enc.bin("pred_mode_flag", 0, 1 if intra else 0)
        if intra:
            self.pred_mode[y4:y4 + n4, x4:x4 + n4] = 1
            self.mvctx.set_intra(x0, y0, 1 << log2_cb)
            part_nxn = False
            if log2_cb == cfg.min_cb_log2:
                part_nxn = bool(rng.random() < 0.4)
                enc.bin("part_mode", 0, 0 if part_nxn else 1)
            self._intra_cu(x0, y0, log2_cb, part_nxn)
            return
        self._inter_cu(x0, y0, log2_cb, depth)

    # ----- inter CU ---------------------------------------------------------
    def _inter_cu(self, x0, y0, log2_cb, depth):
        cfg, rng, enc = self.cfg, self.rng, self.enc
        self.cu_is_intra = False
        cb = 1 << log2_cb
        n4 = cb >> 2
        x4, y4 = x0 >> 2, y0 >> 2
        self.pred_mode[y4:y4 + n4, x4:x4 + n4] = 0
        # part mode: 2Nx2N (60%), 2NxN, Nx2N (+ AMP quarters when enabled)
        r = rng.random()
        part = 0 if r < 0.6 else (1 if r < 0.8 else 2)
        if (cfg.amp_enabled and log2_cb > cfg.min_cb_log2 and
                part != 0 and rng.random() < 0.5):
            part = int(rng.choice([4, 5] if part == 1 else [6, 7]))
        self._encode_part_mode_inter(part, log2_cb)
        pus = self._pu_geom(x0, y0, cb, part)
        any_merge_first = False
        for idx, (px, py, pw, ph) in enumerate(pus):
            merged = self._encode_pu(px, py, pw, ph, part, idx, log2_cb,
                                     x0, y0)
            if idx == 0:
                any_merge_first = merged
        self.pred_buf = self._pred_buf_for(x0, y0, cb, cb)
        # transform tree
        force_tree = part == 0 and any_merge_first  # rqt_root_cbf inferred 1
        plan = self._plan_tree(x0, y0, log2_cb, 0,
                               cfg.max_transform_hierarchy_depth, 0)
        if force_tree and not plan["split"]:
            # depth-0 leaf with inferred cbf_luma=1 needs nonzero luma or a
            # split; force the split when allowed
            if plan.get("explicit_split"):
                plan["split"] = True
                h = cb >> 1
                plan["children"] = [
                    self._plan_tree(x0 + dx, y0 + dy, log2_cb - 1, 1,
                                    cfg.max_transform_hierarchy_depth, 0)
                    for dx, dy in ((0, 0), (h, 0), (0, h), (h, h))]
        self._process_tree(plan, x0, y0, log2_cb, 0, 0)
        cbf_any = self._tree_has_coeffs(plan)
        if not force_tree:
            enc.bin("rqt_root_cbf", 0, 1 if cbf_any else 0)
            if not cbf_any:
                # recon = pred
                pb = self.pred_buf
                for c in range(3):
                    sh = 1 if c else 0
                    xs, ys = x0 >> sh, y0 >> sh
                    ss = cb >> sh
                    self.recon[c][ys:ys + ss, xs:xs + ss] = \
                        pb[c][ys:ys + ss, xs:xs + ss]
                return
        else:
            if not cbf_any and not plan["split"]:
                # ensure inferred cbf_luma=1 holds: force a DC coefficient
                self._force_dc_level(plan)
        self._emit_tree(plan, x0, y0, x0, y0, log2_cb, 0, 0, (1, 1))

    def _force_dc_level(self, plan):
        """Give the depth-0 luma TB a nonzero DC level and redo its recon."""
        cfg = self.cfg
        x0, y0, log2 = plan["x"], plan["y"], plan["log2"]
        size = 1 << log2
        lv = plan["luma_levels"]
        lv[0, 0] = 1
        from ..ops import transforms_np as T
        qp = self._tu_qp(0)
        d = T.dequant(lv, log2, qp, cfg.bit_depth)
        rec_res = T.inverse_transform(d, cfg.bit_depth, is_dst=False)
        pred = self.pred_buf[0][y0:y0 + size, x0:x0 + size]
        self.recon[0][y0:y0 + size, x0:x0 + size] = \
            np.clip(pred + rec_res, 0, (1 << cfg.bit_depth) - 1)

    @staticmethod
    def _chroma_any(node):
        cbs, crs = node["chroma_levels"]
        return any(bool(np.any(lvl)) for (lvl, _t) in cbs + crs)

    def _tree_has_coeffs(self, node):
        if node["split"]:
            r = any(self._tree_has_coeffs(ch) for ch in node["children"])
            if node["log2"] == 3 and "chroma_levels" in node:
                r = r or self._chroma_any(node)
            return r
        r = bool(np.any(node["luma_levels"]))
        if "chroma_levels" in node:
            r = r or self._chroma_any(node)
        return r

    # ----- PU encoding ------------------------------------------------------
    def _encode_pu(self, x0, y0, w, h, part_mode, part_idx, log2_cb,
                   cu_x, cu_y):
        cfg, rng, enc = self.cfg, self.rng, self.enc
        force_il = self.il_every_ctb and not self._ctb_saw_il
        use_merge = (not force_il) and rng.random() < 0.4
        enc.bin("merge_flag", 0, 1 if use_merge else 0)
        if use_merge:
            merge_idx = int(rng.integers(0, cfg.max_merge_cand))
            self._encode_merge_idx(merge_idx)
            f = self.mvctx.merge_mode(x0, y0, w, h, log2_cb, part_mode,
                                      part_idx, merge_idx, cu_x, cu_y)
        else:
            is_b = getattr(self, "slice_type", 1) == 0
            if is_b:
                idc = int(rng.integers(0, 3))  # 0 L0, 1 L1, 2 BI
                if w + h == 12 and idc == 2:
                    idc = int(rng.integers(0, 2))
                self._encode_inter_pred_idc(idc, w, h)
            else:
                idc = 0
            mv = [(0, 0), (0, 0)]
            refs = [0, 0]
            pocs = [0, 0]
            pf = 0
            for lx in range(2):
                if (lx == 0 and idc == 1) or (lx == 1 and idc == 0):
                    continue
                nref = len(self.mvctx.ref_list[lx])
                ref = int(rng.integers(0, nref))
                if force_il:
                    # every CTB's first PU references the IL picture:
                    # the reference upsamples IL CTBs on demand only
                    # (ff_upsample_block + is_upsampled), so untouched
                    # CTBs hold undefined pool data — this invariant
                    # keeps every cross-CTB read deterministic
                    lt = [k for k, e in enumerate(self.mvctx.ref_list[lx])
                          if e[1]]
                    if lt:
                        ref = lt[0]
                        self._ctb_saw_il = True
                self._encode_ref_idx(ref, nref)
                is_lt_ref = bool(self.mvctx.ref_list[lx][ref][1])
                pin_zero = self.zero_mv and is_lt_ref
                if self.il_mv_cap is not None and is_lt_ref and \
                        not pin_zero:
                    # SHVC IL refs with bounded MVs. The compiled
                    # reference upsamples IL CTBs on demand
                    # (ff_upsample_block); its trigger set has no
                    # bottom-left case and untouched CTBs keep
                    # undefined pool data, so deterministic decode
                    # requires every read (block + 4-tap halo) to stay
                    # inside the PU's own CTB — real fractional MC on
                    # the IL picture without the reference's
                    # uninitialized corners.
                    cap = self.il_mv_cap
                    ctb = 1 << cfg.ctb_log2
                    cx0 = (x0 >> cfg.ctb_log2) << cfg.ctb_log2
                    cy0 = (y0 >> cfg.ctb_log2) << cfg.ctb_log2
                    xlo = 4 * (cx0 - x0 + 4)
                    xhi = 4 * (cx0 + ctb - x0 - w - 4)
                    ylo = 4 * (cy0 - y0 + 4)
                    yhi = 4 * (cy0 + ctb - y0 - h - 4)
                    xlo, xhi = max(xlo, -cap), min(xhi, cap)
                    ylo, yhi = max(ylo, -cap), min(yhi, cap)
                    pred = self.mvctx.amvp(x0, y0, w, h, lx, ref,
                                           mvp_pick := int(
                                               rng.integers(0, 2)))
                    tx = int(rng.integers(xlo, xhi + 1)) \
                        if xlo <= xhi else 0
                    ty = int(rng.integers(ylo, yhi + 1)) \
                        if ylo <= yhi else 0
                    if self.il_mv_force is not None:
                        tx, ty = self.il_mv_force
                    mvd = (tx - pred[0], ty - pred[1])
                    self._encode_mvd(mvd)
                    enc.bin("mvp_l0_flag", 0, mvp_pick)
                    mv[lx] = (tx, ty)
                    refs[lx] = ref
                    pocs[lx] = self.mvctx.ref_list[lx][ref][0]
                    pf |= 1 << lx
                    continue
                if pin_zero:
                    # SHVC inter-layer refs: MV must be zero (the
                    # reference's on-demand PU upsampling only covers the
                    # PU's own CTB neighbourhood, ff_upsample_block,
                    # hevc_filter.c:1370)
                    pred0 = self.mvctx.amvp(x0, y0, w, h, lx, ref, 0)
                    pred1 = self.mvctx.amvp(x0, y0, w, h, lx, ref, 1)
                    mvp_pick = int(rng.integers(0, 2))
                    pred = (pred0, pred1)[mvp_pick]
                    mvd = (-pred[0], -pred[1])
                else:
                    mvd = (int(rng.integers(-24, 25)),
                           int(rng.integers(-24, 25)))
                self._encode_mvd(mvd)
                mvp_flag = mvp_pick if pin_zero else \
                    int(rng.integers(0, 2))
                enc.bin("mvp_l0_flag", 0, mvp_flag)
                pred = self.mvctx.amvp(x0, y0, w, h, lx, ref, mvp_flag)
                mv[lx] = (pred[0] + mvd[0], pred[1] + mvd[1])
                refs[lx] = ref
                pocs[lx] = self.mvctx.ref_list[lx][ref][0]
                pf |= 1 << lx
            f = MvField(pf, (tuple(mv[0]), tuple(mv[1])),
                        (refs[0], refs[1]), (pocs[0], pocs[1]))
        self._apply_inter_pu(x0, y0, w, h, f)
        return use_merge

    def _apply_inter_pu(self, x0, y0, w, h, f: MvField):
        self.mvctx.set_pu(x0, y0, w, h, f)
        pb = InterPb(x=x0, y=y0, w=w, h=h,
                     l0=(f.mv[0][0], f.mv[0][1], f.poc[0])
                     if f.pred_flag & 1 else None,
                     l1=(f.mv[1][0], f.mv[1][1], f.poc[1])
                     if f.pred_flag & 2 else None,
                     r0=f.ref_idx[0], r1=f.ref_idx[1])
        self._pu_list.append(pb)

    zero_mv = False       # force MV (0,0) on long-term/IL-ref PUs
    il_mv_cap = None      # cap |MV| (qpel units) on IL-ref PUs instead
    il_mv_force = None    # pin a single (x, y) IL MV (directed tests)
    il_every_ctb = False  # first PU of every CTB references the IL pic
    _ctb_saw_il = True
    weight_table = None   # pred_weight_table for the current slice
    _motion_store: dict = {}   # poc -> (pred_flag4, mv4, refpoc4) for TMVP

    def store_motion(self, poc, i_frame=False):
        """Keep this frame's motion grids + its reference lists' LT map
        (per-frame tab_mvf + refPicList analogue)."""
        if i_frame or not hasattr(self, "mvctx") or self.mvctx is None:
            h4, w4 = self.h4, self.w4
            self._motion_store[poc] = (np.zeros((h4, w4), np.uint8),
                                       np.zeros((h4, w4, 2, 2), np.int32),
                                       np.zeros((h4, w4, 2), np.int32),
                                       {})
        else:
            m = self.mvctx
            lt_map = {p: lt for lst in m.ref_list for (p, lt) in lst}
            self._motion_store[poc] = (m.pred_flag.copy(), m.mv.copy(),
                                       m.refpoc.copy(), lt_map)

    def _pred_buf_for(self, x0, y0, w, h):
        """Frame-sized planes with MC prediction filled for PUs parsed so
        far in this CU (cheap: only the CU area is consumed)."""
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        hs, vs = cfg.hshift1, cfg.vshift1
        bufs = [np.zeros((H, W), np.int64),
                np.zeros((H >> vs, W >> hs), np.int64),
                np.zeros((H >> vs, W >> hs), np.int64)]
        for pb in self._pu_list:
            if not (x0 <= pb.x < x0 + w and y0 <= pb.y < y0 + h):
                continue
            l0p = self.ref_planes.get(pb.l0[2]) if pb.l0 else None
            l1p = self.ref_planes.get(pb.l1[2]) if pb.l1 else None
            pred = mc_np.predict_inter_block(l0p, l1p, pb, cfg.bit_depth,
                                             hshift=hs, vshift=vs,
                                             weights=self.weight_table)
            bufs[0][pb.y:pb.y + pb.h, pb.x:pb.x + pb.w] = pred[0]
            cx, cy = pb.x >> hs, pb.y >> vs
            cw, ch = pb.w >> hs, pb.h >> vs
            bufs[1][cy:cy + ch, cx:cx + cw] = pred[1]
            bufs[2][cy:cy + ch, cx:cx + cw] = pred[2]
        return bufs

    def _encode_inter_pred_idc(self, idc, w, h):
        """Mirror of ff_hevc_inter_pred_idc_decode (0 L0, 1 L1, 2 BI)."""
        enc = self.enc
        if w + h == 12:
            enc.bin("inter_pred_idc", 4, 1 if idc == 1 else 0)
            return
        enc.bin("inter_pred_idc", self.cu_depth, 1 if idc == 2 else 0)
        if idc != 2:
            enc.bin("inter_pred_idc", 4, 1 if idc == 1 else 0)

    # ----- binarization helpers --------------------------------------------
    def _encode_merge_idx(self, idx):
        cfg, enc = self.cfg, self.enc
        if cfg.max_merge_cand <= 1:
            assert idx == 0
            return
        enc.bin("merge_idx", 0, 1 if idx > 0 else 0)
        if idx > 0:
            for k in range(1, idx):
                enc.bypass(1)
            if idx < cfg.max_merge_cand - 1:
                enc.bypass(0)

    def _encode_ref_idx(self, ref, nref):
        enc = self.enc
        mx = nref - 1
        max_ctx = min(mx, 2)
        i = 0
        while i < max_ctx and i < ref:
            enc.bin("ref_idx_l0", i, 1)
            i += 1
        if i < max_ctx:
            enc.bin("ref_idx_l0", i, 0)
            return
        if i == 2:
            while i < mx and i < ref:
                enc.bypass(1)
                i += 1
            if i < mx:
                enc.bypass(0)

    def _encode_mvd(self, mvd):
        enc = self.enc
        gx = min(2, abs(mvd[0]))
        gy = min(2, abs(mvd[1]))
        enc.bin("abs_mvd_greater0_flag", 0, 1 if gx else 0)
        enc.bin("abs_mvd_greater0_flag", 0, 1 if gy else 0)
        if gx:
            enc.bin("abs_mvd_greater1_flag", 1, 1 if gx == 2 else 0)
        if gy:
            enc.bin("abs_mvd_greater1_flag", 1, 1 if gy == 2 else 0)
        for v, g in ((mvd[0], gx), (mvd[1], gy)):
            a = abs(v)
            if g == 2:
                # EG1-style: a = 2 + sum(1<<k over prefix) + suffix
                rem = a - 2
                k = 1
                while rem >= (1 << k):
                    enc.bypass(1)
                    rem -= 1 << k
                    k += 1
                enc.bypass(0)
                for b in range(k - 1, -1, -1):
                    enc.bypass((rem >> b) & 1)
                enc.bypass(1 if v < 0 else 0)
            elif g == 1:
                enc.bypass(1 if v < 0 else 0)

    def _encode_part_mode_inter(self, part, log2_cb):
        cfg, enc = self.cfg, self.enc
        if part == 0:
            enc.bin("part_mode", 0, 1)
            return
        enc.bin("part_mode", 0, 0)
        # (min-CB NxN not generated)
        if log2_cb == cfg.min_cb_log2:
            enc.bin("part_mode", 1, 1 if part == 1 else 0)
            if part != 1:
                if log2_cb != 3:
                    enc.bin("part_mode", 2, 1)
            return
        if not cfg.amp_enabled:
            enc.bin("part_mode", 1, 1 if part == 1 else 0)
            return
        # AMP binarization (ff_hevc_part_mode_decode with amp on)
        if part in (1, 4, 5):            # horizontal family
            enc.bin("part_mode", 1, 1)
            enc.bin("part_mode", 3, 1 if part == 1 else 0)
            if part != 1:
                enc.bypass(1 if part == 5 else 0)   # 2NxnD : 2NxnU
        else:                            # vertical family (2, 6, 7)
            enc.bin("part_mode", 1, 0)
            enc.bin("part_mode", 3, 1 if part == 2 else 0)
            if part != 2:
                enc.bypass(1 if part == 7 else 0)   # nRx2N : nLx2N

    @staticmethod
    def _pu_geom(x0, y0, cb, part):
        h = cb >> 1
        q = cb >> 2
        if part == 0:
            return [(x0, y0, cb, cb)]
        if part == 1:
            return [(x0, y0, cb, h), (x0, y0 + h, cb, h)]
        if part == 2:
            return [(x0, y0, h, cb), (x0 + h, y0, h, cb)]
        if part == 4:    # 2NxnU
            return [(x0, y0, cb, q), (x0, y0 + q, cb, cb - q)]
        if part == 5:    # 2NxnD
            return [(x0, y0, cb, cb - q), (x0, y0 + cb - q, cb, q)]
        if part == 6:    # nLx2N
            return [(x0, y0, q, cb), (x0 + q, y0, cb - q, cb)]
        return [(x0, y0, cb - q, cb), (x0 + cb - q, y0, q, cb)]


class _Sps2:
    def __init__(self, cfg):
        self.log2_ctb = cfg.ctb_log2
        self.ctbs_w = cfg.ctbs_w
        self.ctbs_h = cfg.ctbs_h
        self.width = cfg.width
        self.height = cfg.height


def encode_lowdelay_stream(frames, width, height, qp=32, ctb_log2=4,
                           min_cb_log2=3, seed=0, sao=False, deblock=False,
                           n_refs=1, max_merge=5, b_slices=False,
                           bit_depth=8, wpp=False, chroma_format_idc=1,
                           weighted=False, tmvp=False, amp=False,
                           scaling_list=None, num_slices=1,
                           dependent_slices=False, lt_ref=False,
                           constrained_intra=False, cabac_init=False,
                           lists_modification=False,
                           sign_data_hiding=False):
    """IDR + P,P,... low-delay stream over `frames`. Returns (bytes,
    expected recons). Expected output only valid without loop filters;
    with filters on, compare against the reference decoder."""
    cfg = EncoderConfig(width=width, height=height, qp=qp,
                        bit_depth=bit_depth,
                        chroma_format_idc=chroma_format_idc,
                        ctb_log2=ctb_log2, min_cb_log2=min_cb_log2,
                        min_tb_log2=2, max_tb_log2=min(5, ctb_log2),
                        max_transform_hierarchy_depth=2,
                        pcm_enabled=False, sao_enabled=sao,
                        deblock_disabled=not deblock,
                        max_num_ref=n_refs, max_merge_cand=max_merge,
                        wpp=wpp, weighted_pred=weighted,
                        temporal_mvp=tmvp, amp_enabled=amp,
                        scaling_list=scaling_list,
                        dependent_slices=dependent_slices, lt_ref=lt_ref,
                        constrained_intra=constrained_intra,
                        cabac_init=cabac_init,
                        lists_modification=lists_modification,
                        sign_data_hiding=sign_data_hiding)
    rng = np.random.default_rng(seed)
    # one RPS per possible reference count (early frames have fewer refs)
    st_rps = [[-(i + 1) for i in range(k + 1)] for k in range(n_refs)]
    headers = write_vps(cfg) + write_sps(cfg, st_rps=st_rps) + write_pps(cfg)
    out = headers
    enc = PFrameEncoder(cfg, rng)
    enc.num_st_rps = len(st_rps)
    recons = []
    filtered = []
    # with loop filters on, reference pictures are the *filtered* recon;
    # run our own decoder in-loop to produce them (conformant closed loop)
    self_dec = None
    if sao or deblock:
        from ..decoder import Decoder
        self_dec = Decoder("np")
        self_dec.decode(headers)
    for i, (y, u, v) in enumerate(frames):
        enc._parent_chroma = {}
        enc._pu_list = []
        if i == 0:
            enc.is_p = False
            enc._motion_store = {}
            nal = enc.encode_frame(y, u, v, nal_type=NAL_IDR_N_LP,
                                   num_slices=num_slices,
                                   dependent=dependent_slices)
            enc.store_motion(0, i_frame=True)
        else:
            if lt_ref and i >= 2:
                # frame 0 rides as a long-term reference appended after
                # the short-term window (LT_CURR order, hevc_refs.c:457)
                sts = sorted((p for p in range(len(filtered)) if p != 0),
                             reverse=True)[:n_refs]
                refs = [(p, filtered[p], False) for p in sts] + \
                    [(0, filtered[0], True)]
                lt_entries = [(0, 1, None)]
            else:
                refs = [(p, filtered[p]) for p in
                        sorted(range(len(filtered)), reverse=True)[:n_refs]]
                lt_entries = None
            nal = enc.encode_frame_p(y, u, v, i, refs,
                                     slice_type=0 if b_slices else 1,
                                     num_slices=num_slices,
                                     dependent=dependent_slices,
                                     lt_entries=lt_entries)
            enc.store_motion(i)
        out += nal
        recons.append([p.copy() for p in enc.recon])
        if self_dec is not None:
            self_dec.decode(nal)
            self_dec._drain_parse_all()
            self_dec._flush_pending()   # force the pipelined recon now
            filtered.append([np.asarray(p, np.int64)
                             for p in self_dec.ref_pics[i].planes])
        else:
            filtered.append([p.copy() for p in enc.recon])
    return out, recons


# ---- random-access hierarchical-B stream generator --------------------------
NAL_RASL_R = 9
NAL_CRA = 21


def _pyramid_order(lo, hi, level=1):
    """Decode order of the hierarchical-B pyramid over the open POC
    interval (lo, hi): mid level first, then each half recursively —
    the HM random-access GOP structure. level = sub-layer depth (the
    picture's TemporalId when sub-layers are emitted)."""
    if hi - lo < 2:
        return []
    mid = (lo + hi) // 2
    return ([(mid, lo, hi, level)] + _pyramid_order(lo, mid, level + 1) +
            _pyramid_order(mid, hi, level + 1))


def encode_ra_stream(frames, width, height, qp=32, gop=8, ctb_log2=4,
                     min_cb_log2=3, seed=0, sao=False, deblock=False,
                     intra_period=None, tmvp=False, amp=False,
                     bit_depth=8, wpp=False, n_anchor_refs=2,
                     chroma_format_idc=1, temporal_ids=False,
                     weighted=False, tile_cols=1, tile_rows=1):
    """Random-access stream: IDR + P anchors every `gop` pics with a
    hierarchical-B pyramid between anchors (output reordering,
    num_reorder_pics>0). Anchors at multiples of `intra_period` become
    CRA pictures whose pyramid rides as RASL leading pictures — the
    ra_main-style structure (BASELINE config 2; RPS/bumping truth:
    hevc_refs.c:182-269,637). Per-frame RPSs carry used=0 follow
    entries (pics retained for later pyramid levels), exercising
    RPS-driven DPB retention. Returns (bytes, recons list in POC
    order; recon entries valid only without loop filters — with
    filters cross-check against the reference decoder)."""
    cfg = EncoderConfig(width=width, height=height, qp=qp,
                        bit_depth=bit_depth,
                        chroma_format_idc=chroma_format_idc,
                        ctb_log2=ctb_log2, min_cb_log2=min_cb_log2,
                        min_tb_log2=2, max_tb_log2=min(5, ctb_log2),
                        max_transform_hierarchy_depth=2,
                        pcm_enabled=False, sao_enabled=sao,
                        deblock_disabled=not deblock,
                        max_num_ref=2, max_merge_cand=5,
                        temporal_mvp=tmvp, amp_enabled=amp, wpp=wpp,
                        weighted_pred=weighted,
                        tile_cols=tile_cols, tile_rows=tile_rows,
                        num_reorder_pics=max(1, (gop - 1).bit_length()),
                        max_dec_pic_buffering=(gop - 1).bit_length() + 3)
    rng = np.random.default_rng(seed)
    n = len(frames)
    # ---- decode order: (poc, nal_type, slice_kind) -------------------------
    anchors = list(range(0, n, gop))
    if anchors[-1] != n - 1:
        anchors.append(n - 1)
    order = [(0, NAL_IDR_N_LP, "I", 0)]
    last_irap = 0
    for k in range(1, len(anchors)):
        lo, hi = anchors[k - 1], anchors[k]
        is_cra = bool(intra_period) and hi % intra_period == 0
        if is_cra:
            order.append((hi, NAL_CRA, "I", 0))
        else:
            order.append((hi, NAL_TRAIL_R, "P", 0))
        for (m, a, b, lvl) in _pyramid_order(lo, hi):
            order.append((m, NAL_RASL_R if is_cra else NAL_TRAIL_R, "B",
                          lvl if temporal_ids else 0))
        if is_cra:
            last_irap = hi
    # ---- per-frame used-reference sets (decode order) ----------------------
    # anchors reference up to n_anchor_refs previous anchors >= last IRAP
    # (TRAIL after CRA must not cross it); pyramid Bs their interval ends
    used = []
    irap_at = {}     # poc -> last_irap at that frame's decode position
    li = 0
    banchors = []
    for (p, nal, kind, _tid) in order:
        if kind == "I":
            used.append(set())
            if nal == NAL_CRA:
                li = p
            banchors.append(p)
        elif kind == "P":
            past = [q for q in sorted(banchors, reverse=True) if q >= li]
            used.append(set(past[:n_anchor_refs]))
            banchors.append(p)
        else:
            # recompute this B's interval from the pyramid structure
            lo = max(q for q in banchors if q < p)
            hi = min(q for q in banchors if q > p)
            # locate exact parents in the pyramid (handles nested levels)
            a, b = lo, hi
            while True:
                mid = (a + b) // 2
                if mid == p:
                    break
                if p < mid:
                    b = mid
                else:
                    a = mid
            used.append({a, b})
        irap_at[len(used) - 1] = li
    # ---- RPS per frame: everything still needed by this or later frames ----
    needs_after = [set() for _ in order] + [set()]
    for i in range(len(order) - 1, -1, -1):
        needs_after[i] = used[i] | needs_after[i + 1]
    decoded = set()
    rps_key = []
    patterns = {}
    for i, (p, nal, kind, _tid) in enumerate(order):
        if i == 0:
            rps_key.append(None)
            decoded.add(p)
            continue
        keep = sorted(needs_after[i] & decoded)
        neg = tuple((q - p, 1 if q in used[i] else 0)
                    for q in sorted((q for q in keep if q < p),
                                    reverse=True))
        pos = tuple((q - p, 1 if q in used[i] else 0)
                    for q in sorted(q for q in keep if q > p))
        key = (neg, pos)
        rps_key.append(patterns.setdefault(key, len(patterns)))
        decoded.add(p)
    rps_list = [(list(neg), list(pos)) for (neg, pos) in patterns]
    # ---- encode -------------------------------------------------------------
    headers = write_vps(cfg) + write_sps(cfg, st_rps=rps_list) + \
        write_pps(cfg)
    out = headers
    enc = PFrameEncoder(cfg, rng)
    enc.num_st_rps = len(rps_list)
    enc._motion_store = {}
    recons = [None] * n
    filtered = {}
    self_dec = None
    if sao or deblock:
        from ..decoder import Decoder
        self_dec = Decoder("np")
        self_dec.decode(headers)
    for i, (p, nal, kind, tid) in enumerate(order):
        y, u, v = frames[p]
        enc.temporal_id = tid
        enc._parent_chroma = {}
        enc._pu_list = []
        if kind == "I":
            enc.is_p = False
            nal_bytes = enc.encode_frame(
                y, u, v, nal_type=nal, poc=p,
                num_st_rps=len(rps_list),
                st_rps_idx=rps_key[i] if rps_key[i] is not None else 0)
            enc.store_motion(p, i_frame=True)
        else:
            # mirror of Decoder._build_ref_lists cand order:
            # L0 = before+after, L1 = after+before (hevc_refs.c:457)
            neg, pos = rps_list[rps_key[i]]
            before = [p + d for (d, u_) in neg if u_]
            after = [p + d for (d, u_) in pos if u_]
            cands0 = before + after
            cands1 = after + before
            n0 = min(cfg.max_num_ref, len(cands0))
            l0 = [cands0[k % len(cands0)] for k in range(n0)]
            ref_pics = [(q, filtered[q]) for q in l0]
            ref_pics_l1 = None
            slice_type = 1
            if kind == "B":
                slice_type = 0
                n1 = min(cfg.max_num_ref, len(cands1))
                l1 = [cands1[k % len(cands1)] for k in range(n1)]
                ref_pics_l1 = [(q, filtered[q]) for q in l1]
            nal_bytes = enc.encode_frame_p(
                y, u, v, p, ref_pics, nal_type=nal,
                slice_type=slice_type, ref_pics_l1=ref_pics_l1,
                st_rps_idx_ovr=rps_key[i])
            enc.store_motion(p)
        out += nal_bytes
        recons[p] = [pl.copy() for pl in enc.recon]
        if self_dec is not None:
            self_dec.decode(nal_bytes)
            self_dec._drain_parse_all()
            self_dec._flush_pending()
            filtered[p] = [np.asarray(pl, np.int64)
                           for pl in self_dec.ref_pics[p].planes]
        else:
            filtered[p] = [pl.copy() for pl in enc.recon]
    return out, recons
