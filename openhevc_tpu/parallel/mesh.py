"""Batched frame reconstruction sharded over a device mesh.

One jitted dispatch reconstructs a whole wave of independent pictures
(parallel/frames.py): input tensors carry a leading `frame` axis that
shard_map splits across the mesh's `frame` dimension; each device runs
the complete single-frame XLA program (residual assembly -> inter MC ->
intra wavefront scan -> in-loop filters) on its shard.

INTER pictures join waves too (the pthread_frame.c:325 analogue:
same-dependency-level pictures of a hierarchical-B GOP are mutually
independent): the wave's reference pool — the union of the members'
reference pictures — is prefiltered once (stage-1 MC stacks) and
REPLICATED across the mesh (in_specs P(None)); per-frame motion grids
shard with the frame axis and index the pool via per-frame slot maps.
Collectives are not needed — frames are independent and the pool is
replicated — so scaling rides ICI-free data parallelism; the same
batching amortizes dispatch overhead on one chip.

This is the production analogue of the reference's frame-thread pool
(pthread_frame.c:325): decoder clones become frame shards, progress
gating becomes wave scheduling (frames.py WaveScheduler, driven by
decoder.py's _finish_parsed).
"""
from __future__ import annotations

from functools import partial

import numpy as np

SIZES = (4, 8, 16, 32)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _pad_rows(a, cap, fill=0):
    if a.shape[0] == cap:
        return a
    pad = np.full((cap - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


class MeshFrameDecoder:
    """reconstruct_wave(fs_list) -> [[Y,Cb,Cr] int32 host planes]."""

    def __init__(self, mesh):
        self.mesh = mesh
        shape = dict(mesh.shape)
        self.n_frame = int(shape["frame"])
        # optional 2nd mesh axis: HEVC-tile parallelism within a frame.
        # Residual assembly splits its block list across the tile axis
        # (disjoint scatters -> exact psum combine); intra jobs are
        # grouped by the picture's tile id (cross-tile prediction is
        # normatively unavailable, hevc.c:2917 tiles decode in
        # parallel); deblock/SAO then run on the psum-combined frame
        # (the tiles_filters fix-up, hevc.c:2967, as a collective).
        self.n_tile = int(shape.get("tile", 1))
        self._progs = {}

    # ---- host-side packing ------------------------------------------------
    @staticmethod
    def _intra_grid(pf, fs):
        """Intra job arrays in the level-major [L, cap, ...] layout the
        batched _intra_scan consumes; converts the native parser's flat
        meta when pack_frame produced the stacked/order schedule."""
        if not (isinstance(pf.intra, dict) and "stacked" in pf.intra):
            return pf.intra, pf.n_levels
        raw = fs.native_raw
        im, iav = raw["ij_meta"], raw["ij_avail"]
        n_levels = int(raw["n_levels"])
        intra = {}
        for s in SIZES:
            sel = np.nonzero(im[:, 3] == s)[0]
            if not len(sel):
                intra[s] = None
                continue
            lv = im[sel, 6] - 1
            counts = np.bincount(lv, minlength=n_levels)
            cap = _round_up(int(counts.max()), 8)
            n_ref = 4 * s + 1
            arr = dict(valid=np.zeros((n_levels, cap), np.int32),
                       plane=np.full((n_levels, cap), 3, np.int32),
                       x=np.zeros((n_levels, cap), np.int32),
                       y=np.zeros((n_levels, cap), np.int32),
                       mode=np.zeros((n_levels, cap), np.int32),
                       avail=np.zeros((n_levels, cap, n_ref), bool),
                       filt=np.zeros((n_levels, cap), bool))
            order = np.argsort(lv, kind="stable")
            pos = np.concatenate([[0], np.cumsum(counts)])
            slot = np.empty(len(sel), np.int64)
            slot[order] = np.arange(len(sel)) - pos[lv[order]]
            arr["valid"][lv, slot] = 1
            arr["plane"][lv, slot] = im[sel, 0]
            arr["x"][lv, slot] = im[sel, 1]
            arr["y"][lv, slot] = im[sel, 2]
            arr["mode"][lv, slot] = im[sel, 4]
            arr["filt"][lv, slot] = im[sel, 5] != 0
            arr["avail"][lv, slot] = iav[sel, :n_ref] != 0
            intra[s] = arr
        return intra, n_levels

    @staticmethod
    def _inter_fields(fs, slot_of):
        """Per-frame dense MC fields (the _pack_inter layout) with ref
        slots mapped into the WAVE's reference pool via slot_of
        (poc -> pool index)."""
        mc = fs.motion
        h4, w4 = mc.pred_flag.shape
        pf4 = np.asarray(mc.pred_flag, np.uint8)
        slot = np.zeros((2, h4, w4), np.uint8)
        for lx in range(2):
            pocg = np.asarray(mc.refpoc[:, :, lx])
            s = np.zeros((h4, w4), np.uint8)
            for p, i in slot_of.items():
                s[pocg == p] = i
            slot[lx] = s
        mv = np.asarray(mc.mv, np.int16)
        return dict(pf4=pf4, mv=mv, slot=slot)

    def _stack_inter(self, fs_list, refs_list, pfs, npad, sps):
        """Wave reference pool + stacked per-frame motion tensors.
        Returns (hf_pool, motion) — hf_pool None when the wave is
        all-intra. The pool is keyed by picture object identity (POCs
        can repeat across an in-wave IDR boundary)."""
        import jax.numpy as jnp
        from ..ops.mc import mc_hprefilter
        has_inter = any(fs.inter_pbs for fs in fs_list)
        if not has_inter:
            return None, None
        pool = []                      # [(id, planes_obj)]
        pool_idx = {}
        slot_ofs = []
        for fs, refs in zip(fs_list, refs_list):
            refs = refs or {}
            so = {}
            pocs = sorted({p for p in
                           set(fs.ref_poc_l0) | set(fs.ref_poc_l1)
                           if p in refs})
            for p in pocs:
                obj = refs[p]
                k = id(obj)
                if k not in pool_idx:
                    pool_idx[k] = len(pool)
                    pool.append(obj)
                so[p] = pool_idx[k]
            slot_ofs.append(so)
        if not pool:
            return None, None
        R = len(pool)
        rp = 1 << (R - 1).bit_length()
        pool = pool + [pool[0]] * (rp - R)
        bd = sps.bit_depth
        hf_pool = []
        for c in range(3):
            planes_c = [jnp.asarray(np.asarray(obj[c], np.int32))
                        for obj in pool]
            hf_pool.append(jnp.stack(
                [mc_hprefilter(p, bit_depth=bd, is_luma=(c == 0))
                 for p in planes_c]))
        has_wt = any(fs.weights is not None and fs.inter_pbs
                     for fs in fs_list)
        fields = []
        h4w4 = None
        for fs, so in zip(fs_list, slot_ofs):
            if fs.inter_pbs:
                f = self._inter_fields(fs, so)
                h4w4 = f["pf4"].shape
                if has_wt:
                    # weighted members carry their grids; unweighted
                    # ones ride identity weights (w=1, o=0, denom=0 —
                    # exactly the default combine, ops/mc.py)
                    from ..models.pipeline import weight_grids
                    wt = weight_grids(fs)
                    if wt is not None:
                        f["wg"], f["og"] = wt["wg"], wt["og"]
                        f["den"] = np.asarray(wt["denoms"], np.int32)
                    else:
                        f["wg"] = np.ones((2, 3) + h4w4, np.int16)
                        f["og"] = np.zeros((2, 3) + h4w4, np.int16)
                        f["den"] = np.zeros(2, np.int32)
            else:
                f = None
            fields.append(f)
        zero = dict(pf4=np.zeros(h4w4, np.uint8),
                    mv=np.zeros(h4w4 + (2, 2), np.int16),
                    slot=np.zeros((2,) + h4w4, np.uint8))
        if has_wt:
            zero["wg"] = np.ones((2, 3) + h4w4, np.int16)
            zero["og"] = np.zeros((2, 3) + h4w4, np.int16)
            zero["den"] = np.zeros(2, np.int32)
        fields = [f or zero for f in fields]
        fields += [fields[-1]] * (npad - len(fields))
        keys = ("pf4", "mv", "slot") + \
            (("wg", "og", "den") if has_wt else ())
        motion = {k: np.stack([f[k] for f in fields]) for k in keys}
        return hf_pool, motion

    def _tile_group_map(self, fs):
        """[ch, cw] int32 tile-axis shard index per CTB (tile id modulo
        the tile-axis size; untiled pictures land on shard 0)."""
        sps, pps = fs.sps, fs.pps
        if getattr(pps, "tiles_enabled", 0):
            from ..bitstream.ps import ctb_tile_maps
            tile_id = ctb_tile_maps(pps, sps)[2]
            return (tile_id % self.n_tile).astype(np.int32)
        return np.zeros((sps.ctbs_h, sps.ctbs_w), np.int32)

    def _group_intra_tiles(self, intra, gmaps, sps):
        """Regroup stacked intra job arrays {s: {k: [F, L, cap, ...]}}
        into per-tile-shard arrays {s: {k: [F, T, L, capg, ...]}} by the
        job's tile group. Cross-tile intra prediction is normatively
        unavailable, so a shard's jobs read only pixels its own tiles
        wrote (plus the replicated inter/PCM prefill)."""
        T = self.n_tile
        cl = sps.log2_ctb
        out = {}
        for s, a in intra.items():
            F, L, cap = a["x"].shape
            pl = a["plane"]
            lx = np.where(pl == 0, a["x"], a["x"] << sps.hshift1)
            ly = np.where(pl == 0, a["y"], a["y"] << sps.vshift1)
            ch, cw = gmaps.shape[1:]
            cy = np.clip(ly >> cl, 0, ch - 1)
            cx = np.clip(lx >> cl, 0, cw - 1)
            g = gmaps[np.arange(F)[:, None, None], cy, cx]
            valid = a["valid"] != 0
            fields = {}
            capg = 8
            sel_masks = []
            for t in range(T):
                m = valid & (g == t)
                sel_masks.append(m)
                capg = max(capg, int(m.sum(axis=2).max()) if m.size
                           else 0)
            capg = _round_up(capg, 8)
            for k, v in a.items():
                shp = (F, T, L, capg) + v.shape[3:]
                fill = 3 if k == "plane" else 0
                nv = np.full(shp, fill, v.dtype)
                for t in range(T):
                    m = sel_masks[t]
                    order = np.argsort(~m, axis=2, kind="stable")
                    take = order[:, :, :capg]
                    gath = np.take_along_axis(
                        v, take.reshape(take.shape + (1,) *
                                        (v.ndim - 3)), axis=2)
                    keep = np.take_along_axis(m, take, axis=2)
                    nv[:, t] = np.where(
                        keep.reshape(keep.shape + (1,) * (v.ndim - 3)),
                        gath, fill)
                fields[k] = nv
            fields["valid"] = fields["valid"].astype(np.int32)
            out[s] = fields
        return out

    def _split_res_tiles(self, res, T, gmaps, sps):
        """Regroup each stacked residual bucket's blocks BY TILE SHARD:
        [F, cap, ...] -> [F, T, capg, ...] where shard t gets exactly
        the blocks of its own tiles (gmaps). Each shard then owns its
        tiles' full residual — no cross-shard residual psum is needed
        before reconstruction; the single end-of-frame masked pixel
        combine (hevc.c:2967 role) is the only exchange."""
        cl = sps.log2_ctb
        ch, cw = gmaps.shape[1:]
        out = {}
        for s, fields in res.items():
            F, cap = fields["qp"].shape[:2]
            pl = fields["plane"]
            # luma-grid coords of each block (chroma scales by hs/vs)
            lx = np.where(pl == 0, fields["bx"] * s,
                          (fields["bx"] * s) << sps.hshift1)
            ly = np.where(pl == 0, fields["by"] * s,
                          (fields["by"] * s) << sps.vshift1)
            cy = np.clip(ly >> cl, 0, ch - 1)
            cx = np.clip(lx >> cl, 0, cw - 1)
            g = gmaps[np.arange(F)[:, None], cy, cx]
            valid = pl != 3                    # padded rows -> nowhere
            capg = 16
            masks = []
            for t in range(T):
                m = valid & (g == t)
                masks.append(m)
                capg = max(capg, int(m.sum(axis=1).max()) if m.size
                           else 0)
            capg = _round_up(capg, 16)
            nf = {}
            for k, v in fields.items():
                fill = 3 if k == "plane" else (16 if k == "sm" else 0)
                nv = np.full((F, T, capg) + v.shape[2:], fill, v.dtype)
                for t in range(T):
                    m = masks[t]
                    order = np.argsort(~m, axis=1, kind="stable")
                    take = order[:, :capg]
                    gath = np.take_along_axis(
                        v, take.reshape(take.shape + (1,) *
                                        (v.ndim - 2)), axis=1)
                    keep = np.take_along_axis(m, take, axis=1)
                    nv[:, t] = np.where(
                        keep.reshape(keep.shape + (1,) * (v.ndim - 2)),
                        gath, fill)
                nf[k] = nv
            out[s] = nf
        return out

    def _stack_wave(self, fs_list, want_intra=True):
        from ..models.pipeline import pack_frame
        pfs = [pack_frame(fs) for fs in fs_list]
        if want_intra:
            grids = [self._intra_grid(pf, fs)
                     for pf, fs in zip(pfs, fs_list)]
        else:
            # fused-kernel wave: intra rides the [5, npad] meta stack
            # (_stack_fused_meta); skip the per-level grid build
            grids = [({s: None for s in SIZES}, 0) for _ in pfs]
        for pf, (g, nl) in zip(pfs, grids):
            pf.intra = g
            pf.n_levels = nl
        sps = fs_list[0].sps
        n = len(pfs)
        npad = _round_up(n, self.n_frame)
        pfs = pfs + [pfs[-1]] * (npad - n)

        res_caps = {}
        for s in SIZES:
            caps = [pf.res[s]["qp"].shape[0] for pf in pfs
                    if pf.res[s] is not None]
            if caps:
                res_caps[s] = _round_up(max(caps), 16)
        has_sm = any(pf.res[s] is not None and pf.res[s].get("sm")
                     is not None for pf in pfs for s in res_caps)
        res = {}
        for s, cap in res_caps.items():
            fields = dict(levels=[], qp=[], flags=[], plane=[], bx=[],
                          by=[], sm=[])
            for pf in pfs:
                b = pf.res[s]
                if b is None:
                    b = dict(levels=np.zeros((0, s, s), np.int32),
                             qp=np.zeros(0, np.int32),
                             flags=np.zeros((0, 5), bool),
                             plane=np.zeros(0, np.int32),
                             bx=np.zeros(0, np.int32),
                             by=np.zeros(0, np.int32), sm=None)
                fields["levels"].append(_pad_rows(b["levels"], cap))
                fields["qp"].append(_pad_rows(b["qp"], cap))
                fields["flags"].append(_pad_rows(b["flags"], cap))
                # padding rows scatter into the write-off plane 3
                fields["plane"].append(_pad_rows(b["plane"], cap, 3))
                fields["bx"].append(_pad_rows(b["bx"], cap))
                fields["by"].append(_pad_rows(b["by"], cap))
                if has_sm:
                    sm = b.get("sm")
                    if sm is None:
                        sm = np.full((0, s, s), 16, np.int32)
                    fields["sm"].append(_pad_rows(sm, cap, 16))
            res[s] = {k: np.stack(v) for k, v in fields.items()
                      if k != "sm" or has_sm}

        n_levels = max(pf.n_levels for pf in pfs)
        intra = {}
        for s in SIZES:
            caps = [pf.intra[s]["x"].shape[1] for pf in pfs
                    if pf.intra[s] is not None]
            if not caps:
                continue
            cap = _round_up(max(caps), 8)
            n_ref = 4 * s + 1
            fields = {k: [] for k in ("valid", "plane", "x", "y",
                                      "mode", "avail", "filt")}
            for pf in pfs:
                a = pf.intra[s]
                for k in fields:
                    if a is None:
                        shape = (n_levels, cap) + \
                            ((n_ref,) if k == "avail" else ())
                        if k == "plane":
                            v = np.full(shape, 3, np.int32)
                        elif k in ("avail", "filt"):
                            v = np.zeros(shape, bool)
                        else:
                            v = np.zeros(shape, np.int32)
                    else:
                        v = a[k]
                        L0, c0 = v.shape[:2]
                        fillv = 3 if k == "plane" else 0
                        if c0 < cap:
                            pad = np.full((L0, cap - c0) + v.shape[2:],
                                          fillv, v.dtype)
                            v = np.concatenate([v, pad], axis=1)
                        if L0 < n_levels:
                            pad = np.full(
                                (n_levels - L0, cap) + v.shape[2:],
                                fillv, v.dtype)
                            v = np.concatenate([v, pad], axis=0)
                    fields[k].append(v)
            intra[s] = {k: np.stack(v) for k, v in fields.items()}

        planes0 = np.stack([pf.planes0 for pf in pfs])
        # in-loop filter control tensors (device path when exact)
        from ..ops.filters_jax import device_filters_ok, prep_filters
        want = any(not fs.deblock_disabled or fs.sao_luma or fs.sao_chroma
                   for fs in fs_list)
        fstack = None
        fmask = 0
        if want and device_filters_ok(fs_list[0]):
            pffs = [prep_filters(fs) for fs in fs_list]
            pffs += [pffs[-1]] * (npad - n)
            if all(p is not None for p in pffs):
                fmask = (1 if any(p["do_deblock"] for p in pffs) else 0) \
                    | (2 if any(p["do_sao"] for p in pffs) else 0)
                z2 = np.zeros((1, 1), np.int16)
                z4 = np.zeros((1, 1, 3, 6), np.int16)
                from ..ops.filters_jax import FARG_KEYS
                shapes = {}
                for k in FARG_KEYS:
                    for p in pffs:
                        if k in p:
                            shapes[k] = p[k].shape
                            break
                fstack = tuple(
                    np.stack([np.ascontiguousarray(
                        p.get(k, np.zeros(shapes.get(
                            k, (1, 1) if k != "sao" else (1, 1, 3, 6)),
                            np.int16)))
                        for p in pffs])
                    for k in FARG_KEYS)
        return pfs, npad, res, intra, planes0, fstack, fmask, n_levels

    def _fused_wave_plan(self, sps):
        """(hl, wl, hc, wc, banded) for the fused Pallas intra kernel
        over this SPS, or None when unavailable (mirrors
        JaxEngine._fused_plan without the engine). Gates on the MESH
        devices' platform — the process default backend is the TPU
        even when the mesh is built from virtual CPU devices (the test
        rig), and Mosaic only targets real TPUs."""
        try:
            plat = next(iter(self.mesh.devices.flat)).platform
        except Exception:
            return None
        if plat not in ("tpu", "axon"):
            return None
        from ..ops.intra_fused import padded_dims, band_plan
        from ..models.pipeline import JaxEngine
        H, W = sps.height, sps.width
        Hc, Wc = H >> sps.vshift1, W >> sps.hshift1
        hl, wl = padded_dims(H, W)
        hc, wc = padded_dims(Hc, Wc)
        if (hl * wl + 2 * hc * wc) * 4 * 2 <= JaxEngine.FUSED_VMEM_BUDGET:
            return (hl, wl, hc, wc, None)
        plan = band_plan(H, W, Hc, Wc, sps.ctb_size, sps.vshift1)
        if plan is None:
            return None
        band_h, nb, hl, wl, hc, wc = plan
        return (hl, wl, hc, wc, (band_h, nb))

    def _stack_fused_meta(self, fs_list, npad, sps, banded):
        """[npad_frames, 5, npad_m] meta stack + [npad_frames, 1, 1]
        job counts (+ band bounds when banded) for the fused wave
        path."""
        from ..ops.intra_fused import (pack_meta_native,
                                       pack_meta_objects,
                                       sort_meta_by_band, _bucket)
        metas, nns, bounds = [], [], []
        vs = sps.vshift1
        for fs in fs_list:
            np_ = fs.native_pack
            if np_ is not None:
                meta, n = np_["meta"], np_["n"]
            else:
                if fs.native_raw is not None:
                    meta = pack_meta_native(fs.native_raw)
                else:
                    fs.ensure_objects()
                    meta = pack_meta_objects(fs.intra_jobs)
                n = meta.shape[1]
            metas.append(np.asarray(meta))
            nns.append(n)
        npad_m = _bucket(max((m.shape[1] for m in metas), default=1))
        out_m, out_b = [], []
        for meta, n in zip(metas, nns):
            if meta.shape[1] < npad_m:
                meta = np.concatenate(
                    [meta, np.zeros((meta.shape[0],
                                     npad_m - meta.shape[1]),
                                    meta.dtype)], axis=1)
            if banded is not None:
                meta, bnd = sort_meta_by_band(meta, n, banded[0], vs,
                                              banded[1])
                out_b.append(bnd)
            out_m.append(meta)
        out_m += [out_m[-1]] * (npad - len(out_m))
        nns += [0] * (npad - len(nns))
        if banded is not None:
            out_b += [out_b[-1]] * (npad - len(out_b))
        return (np.stack(out_m),
                np.asarray(nns, np.int32).reshape(-1, 1, 1),
                np.stack(out_b) if banded is not None else None,
                npad_m)

    # ---- device program ---------------------------------------------------
    def _program(self, key, sps, sizes, isizes, fmask, has_sm, n_levels,
                 has_inter=False, tiled=False, has_wt=False,
                 fused=None):
        if key in self._progs:
            return self._progs[key]
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from ..ops.idct import residual_bucket, scatter_blocks
        from ..models.pipeline import _intra_scan
        from ..ops.filters_jax import apply_filters_device
        from ..ops.mc import mc_put_core, combine_plane, combine_plane_w

        H, W = sps.height, sps.width
        hs, vs = sps.hshift1, sps.vshift1
        Hc, Wc = H >> vs, W >> hs
        bd, bdc = sps.bit_depth, sps.bit_depth_chroma
        cs = 1 << sps.log2_ctb
        strong = bool(sps.strong_intra_smoothing)

        def one_frame(planes0, res, intra, fargs, mo, hf, gmap):
            res_planes = jnp.zeros_like(planes0)
            for s in sizes:
                b = res[s]
                fl = b["flags"]
                r = residual_bucket(
                    b["levels"], b["qp"], fl[:, 0], fl[:, 1], fl[:, 2],
                    fl[:, 3], fl[:, 4], s=s, bit_depth=bd,
                    sm=b.get("sm"))
                res_planes = scatter_blocks(res_planes, r, b["plane"],
                                            b["bx"], b["by"], s=s)
            # tiled: residual blocks are grouped BY TILE SHARD
            # (_split_res_tiles), so each shard owns its tiles' full
            # residual — no cross-shard residual psum (was a [4, H, W]
            # int32 plane exchange, ~132 MB at 4K)
            planes = planes0
            if mo is not None:
                # inter prediction from the replicated wave ref pool
                # (two-stage MC; hf prefiltered once per pool entry)
                pf4 = mo["pf4"].astype(jnp.int32)
                for c in range(3):
                    is_luma = c == 0
                    ph = H if is_luma else Hc
                    pw = W if is_luma else Wc
                    reph = 4 if is_luma else 4 >> hs
                    repv = 4 if is_luma else 4 >> vs
                    puts = [mc_put_core(hf[c], mo["mv"][:, :, lx],
                                        mo["slot"][lx], bit_depth=bd,
                                        is_luma=is_luma, hs=hs, vs=vs,
                                        H=ph, W=pw)
                            for lx in range(2)]

                    def up(a):
                        return jnp.repeat(jnp.repeat(
                            a.astype(jnp.int32), repv, 0),
                            reph, 1)[:ph, :pw]

                    pf = up(pf4)
                    if has_wt:
                        # per-frame weights; unweighted members carry
                        # identity (w=1, o=0, denom=0) so the formula
                        # reduces to the default combine
                        out = combine_plane_w(
                            puts[0], puts[1], pf,
                            res_planes[c, :ph, :pw],
                            up(mo["wg"][0, c]), up(mo["og"][0, c]),
                            up(mo["wg"][1, c]), up(mo["og"][1, c]),
                            bit_depth=bd,
                            denom=mo["den"][0 if is_luma else 1])
                    else:
                        out = combine_plane(puts[0], puts[1], pf,
                                            res_planes[c, :ph, :pw],
                                            bit_depth=bd)
                    cur = planes[c, :ph, :pw]
                    planes = planes.at[c, :ph, :pw].set(
                        jnp.where(pf > 0, out, cur))
            if fused is not None:
                # fused Pallas intra: same kernel as the single-chip
                # path (pipeline._frame_fused) — embed the post-inter
                # planes + residual maps into the padded buffers, run
                # every intra TU in decode order, crop back
                from ..ops.intra_fused import _build, _build_banded, \
                    OY, OX
                from ..models.pipeline import _derive_meta16
                hl, wl, hc, wc, banded_p, npad_m = fused
                meta16 = _derive_meta16(
                    intra["meta"], bool(getattr(
                        sps, "intra_smoothing_disabled", 0)),
                    sps.chroma_format_idc == 3, strong)
                lu = jnp.zeros((hl, wl), jnp.int32).at[
                    OY:OY + H, OX:OX + W].set(planes[0, :H, :W])
                chp = jnp.zeros((2, hc, wc), jnp.int32)
                chp = chp.at[0, OY:OY + Hc, OX:OX + Wc].set(
                    planes[1, :Hc, :Wc])
                chp = chp.at[1, OY:OY + Hc, OX:OX + Wc].set(
                    planes[2, :Hc, :Wc])
                rl = jnp.zeros((hl, wl), jnp.int32).at[
                    OY:OY + H, OX:OX + W].set(res_planes[0, :H, :W])
                rc = jnp.zeros((2, hc, wc), jnp.int32).at[
                    :, OY:OY + Hc, OX:OX + Wc].set(
                    res_planes[1:3, :Hc, :Wc])
                if banded_p is None:
                    lu, chp = _build(hl, wl, hc, wc, npad_m, bd)(
                        meta16, intra["nn"], lu, chp, rl, rc)
                else:
                    band_h, nb = banded_p
                    vsc = 0 if Hc == H else 1
                    lu, chp = _build_banded(hl, wl, hc, wc, npad_m,
                                            bd, band_h, vsc, nb)(
                        meta16, intra["bounds"], lu, chp, rl, rc)
                planes = planes.at[0, :H, :W].set(
                    lu[OY:OY + H, OX:OX + W])
                planes = planes.at[1, :Hc, :Wc].set(
                    chp[0, OY:OY + Hc, OX:OX + Wc])
                planes = planes.at[2, :Hc, :Wc].set(
                    chp[1, OY:OY + Hc, OX:OX + Wc])
            elif isizes and n_levels:
                xs = {s: intra[s] for s in isizes}
                if tiled:
                    # intra job arrays vary over the tile axis; mark the
                    # carried planes tile-varying so the scan types agree
                    def _vary(x):
                        try:
                            return jax.lax.pcast(x, ("tile",),
                                                 to="varying")
                        except (AttributeError, TypeError):
                            return jax.lax.pvary(x, ("tile",))
                        except ValueError:
                            return x       # already tile-varying
                    planes = _vary(planes)
                    res_planes = _vary(res_planes)
                planes = _intra_scan(planes, res_planes, xs, isizes,
                                     bd, strong)
            y = planes[0, :H, :W]
            cb = planes[1, :Hc, :Wc]
            cr = planes[2, :Hc, :Wc]
            if tiled:
                # combine tile shards: every pixel belongs to exactly
                # one shard's tile set (the tiles_filters handoff,
                # hevc.c:2967 — here one masked psum over ICI)
                g = jax.lax.axis_index("tile")
                ml = jnp.repeat(jnp.repeat(gmap, cs, 0), cs, 1)[:H, :W] \
                    == g
                mc_ = jnp.repeat(jnp.repeat(gmap, cs >> vs, 0),
                                 cs >> hs, 1)[:Hc, :Wc] == g
                y = jax.lax.psum(jnp.where(ml, y, 0), "tile")
                cb = jax.lax.psum(jnp.where(mc_, cb, 0), "tile")
                cr = jax.lax.psum(jnp.where(mc_, cr, 0), "tile")
            if fmask and tiled:
                y, cb, cr = band_filters(y, cb, cr, fargs, g)
            elif fmask:
                y, cb, cr = apply_filters_device(
                    y, cb, cr, *fargs, bd=bd, bdc=bdc, cs=cs,
                    do_deblock=bool(fmask & 1), do_sao=bool(fmask & 2),
                    hs=hs, vs=vs)
            dt = jnp.uint8 if bd <= 8 else jnp.uint16
            return jnp.concatenate([y.astype(dt).reshape(-1),
                                    cb.astype(dt).reshape(-1),
                                    cr.astype(dt).reshape(-1)])

        T = self.n_tile
        rb = -(-sps.ctbs_h // T)          # CTB rows per shard band
        csv = cs >> vs

        def band_filters(y, cb, cr, fargs, g):
            """Filter stage sharded over the tile axis: shard g filters
            only CTB rows [g*rb, (g+1)*rb) with a 1-CTB halo (>= the
            12-row deblock+SAO support), and a second masked psum
            combines the disjoint interior bands. Replaces replicated
            whole-frame filtering — per-shard filter compute drops
            T-fold; control grids are tiny and slice per band."""
            def pad_rows(p, unit):
                total = (rb * T + 2) * unit
                return jnp.pad(p, ((unit, total - unit - p.shape[0]),) +
                               ((0, 0),) * (p.ndim - 1))

            def band(p, unit):
                return jax.lax.dynamic_slice_in_dim(
                    pad_rows(p, unit), g * rb * unit,
                    (rb + 2) * unit, 0)

            # per-grid row units (luma 4/8-px edge rows, chroma rows,
            # per-CTB SAO, per-chroma-pixel stale masks)
            units = dict(beta_v=cs // 4, tc_v=cs // 4,
                         beta_h=cs // 8, tc_h=cs // 8,
                         tc_cv1=csv // 4, tc_ch1=csv // 8,
                         tc_cv2=csv // 4, tc_ch2=csv // 8,
                         sao=1, nop_v=cs // 4, noq_v=cs // 4,
                         nop_h=cs // 8, noq_h=cs // 8,
                         nop_cv=csv // 4, noq_cv=csv // 4,
                         nop_ch=csv // 8, noq_ch=csv // 8,
                         nf4=cs // 4, nf4c=cs // 4,
                         st_b0=csv, st_b2=csv, st_a3=csv)
            from ..ops.filters_jax import FARG_KEYS
            fb = tuple(a if a.shape[:2] == (1, 1)
                       else band(a, units[k])
                       for k, a in zip(FARG_KEYS, fargs))
            # true picture rows in band coordinates: SAO border
            # restrictions apply at the real frame top/bottom, not at
            # the band's halo edges
            ybounds = ((cs - g * rb * cs, H + cs - g * rb * cs),
                       (csv - g * rb * csv, Hc + csv - g * rb * csv))
            yb, cbb, crb = apply_filters_device(
                band(y, cs), band(cb, csv), band(cr, csv), *fb,
                ybounds=ybounds,
                bd=bd, bdc=bdc, cs=cs, do_deblock=bool(fmask & 1),
                do_sao=bool(fmask & 2), hs=hs, vs=vs)

            def emit(bp, unit, hfull):
                interior = jax.lax.dynamic_slice_in_dim(
                    bp, unit, rb * unit, 0)
                full = jnp.zeros((rb * T * unit,) + bp.shape[1:],
                                 bp.dtype)
                full = jax.lax.dynamic_update_slice_in_dim(
                    full, interior, g * rb * unit, 0)
                return jax.lax.psum(full, "tile")[:hfull]

            return (emit(yb, cs, H), emit(cbb, csv, Hc),
                    emit(crb, csv, Hc))

        def block(planes0, res, intra, fargs, motion, hf, gmaps):
            # per-device shard: loop the local frames (static count);
            # with a tile axis the per-shard res/intra carry a local
            # tile dim of 1 ([Floc, 1, ...]) that is squeezed here
            nloc = planes0.shape[0]

            def sq(v):
                return v[0] if tiled else v

            outs = []
            for i in range(nloc):
                fa = tuple(f[i] for f in fargs) if fargs is not None \
                    else None
                mo = {k: v[i] for k, v in motion.items()} \
                    if motion is not None else None
                outs.append(one_frame(
                    planes0[i],
                    {s: {k: sq(v[i]) for k, v in res[s].items()}
                     for s in sizes},
                    {k: v[i] for k, v in intra.items()} if fused
                    else {s: {k: sq(v[i]) for k, v in intra[s].items()}
                          for s in isizes},
                    fa, mo, hf,
                    gmaps[i] if tiled else None))
            return jnp.stack(outs)

        res_spec = P("frame", "tile") if tiled else P("frame")
        if fused is not None:
            ispec = {"meta": P("frame"), "nn": P("frame")}
            if fused[4] is not None:
                ispec["bounds"] = P("frame")
        else:
            ispec = {s: {k: res_spec for k in
                         ("valid", "plane", "x", "y", "mode", "avail",
                          "filt")} for s in isizes}
        spec_in = (P("frame"),
                   {s: {k: res_spec for k in
                        (("levels", "qp", "flags", "plane", "bx", "by") +
                         (("sm",) if has_sm else ()))} for s in sizes},
                   ispec)
        spec_f = (tuple(P("frame") for _ in range(22)),) if fmask \
            else ((),)
        mkeys = ("pf4", "mv", "slot") + \
            (("wg", "og", "den") if has_wt else ())
        spec_m = ({k: P("frame") for k in mkeys},) \
            if has_inter else ((),)
        # the hf ref pool is REPLICATED (P() over all axes): every
        # device holds the wave's reference pictures, as every frame
        # may read any of them
        spec_h = ((P(), P(), P()),) if has_inter else ((),)
        spec_g = (P("frame"),) if tiled else ((),)
        spec_in = spec_in + spec_f + spec_m + spec_h + spec_g

        def entry(p, r, i, fa, mo, hf, gm):
            return block(p, r, i, fa if fmask else None,
                         mo if has_inter else None,
                         hf if has_inter else None,
                         gm if tiled else None)

        kw = {}
        if fused is not None:
            # pallas_call output avals carry no varying-manual-axes
            # info; disable the vma check for the fused-kernel program
            # (jax >= 0.9 shard_map; older versions lack the kwarg)
            kw = {"check_vma": False}
        try:
            fn = shard_map(entry, mesh=self.mesh, in_specs=spec_in,
                           out_specs=P("frame"), **kw)
        except TypeError:
            fn = shard_map(entry, mesh=self.mesh, in_specs=spec_in,
                           out_specs=P("frame"))
        prog = jax.jit(fn)
        self._progs[key] = prog
        return prog

    # ---- public -----------------------------------------------------------
    def reconstruct_wave(self, fs_list, refs_list=None):
        """All pictures share one SPS and are mutually independent
        (no member references another member). refs_list: per-picture
        {poc: [Y,Cb,Cr]-like} reference planes for inter members.
        Returns per-picture [Y, Cb, Cr] int32 host planes (pre- or
        post-filter depending on the device-filter verdict; the caller
        applies host filters when fmask == 0 and filters are wanted)."""
        import jax.numpy as jnp
        sps = fs_list[0].sps
        tiled = self.n_tile > 1
        # fused Pallas intra per wave member (the single-chip kernel;
        # VERDICT r04 item 6) — TPU backend, untiled waves; tiled waves
        # keep the per-level path (their jobs group per tile shard)
        fplan = None if tiled else self._fused_wave_plan(sps)
        (pfs, npad, res, intra, planes0, fstack, fmask,
         n_levels) = self._stack_wave(fs_list, want_intra=fplan is None)
        if refs_list is None:
            refs_list = [None] * len(fs_list)
        hf_pool, motion = self._stack_inter(fs_list, refs_list, pfs,
                                            npad, sps)
        has_inter = motion is not None
        gmaps = None
        if tiled:
            gm = [self._tile_group_map(fs) for fs in fs_list]
            gm += [gm[-1]] * (npad - len(gm))
            gmaps = np.stack(gm)
            intra = self._group_intra_tiles(intra, gmaps, sps)
            res = self._split_res_tiles(res, self.n_tile, gmaps, sps)
        sizes = tuple(sorted(res))
        fused = None
        if fplan is not None:
            fmeta, fnn, fbounds, npad_m = self._stack_fused_meta(
                fs_list, npad, sps, fplan[4])
            intra = {"meta": fmeta, "nn": fnn}
            if fbounds is not None:
                intra["bounds"] = fbounds
            fused = fplan[:4] + (fplan[4], npad_m)
            isizes = ()
            ikey = ("fused", npad_m, fplan)
        else:
            isizes = tuple(sorted(intra))
            ikey = tuple(intra[s]["x"].shape[-1] for s in isizes)
        has_sm = any("sm" in res[s] for s in sizes)
        has_wt = has_inter and "wg" in motion
        key = (sps.sps_id, sps.width, sps.height, sizes, isizes,
               tuple(res[s]["qp"].shape[-1] for s in sizes),
               ikey,
               n_levels, fmask, has_sm, npad,
               len(hf_pool[0]) if has_inter else 0, has_wt)
        prog = self._program(key, sps, sizes, isizes, fmask, has_sm,
                             n_levels, has_inter=has_inter, tiled=tiled,
                             has_wt=has_wt, fused=fused)
        args = (jnp.asarray(planes0),
                {s: {k: jnp.asarray(v) for k, v in res[s].items()}
                 for s in sizes},
                {k: jnp.asarray(v) for k, v in intra.items()} if fused
                else {s: {k: jnp.asarray(v) for k, v in intra[s].items()}
                      for s in isizes})
        args = args + ((tuple(jnp.asarray(f) for f in fstack),)
                       if fmask else ((),))
        if has_inter:
            args = args + ({k: jnp.asarray(v)
                            for k, v in motion.items()},
                           tuple(hf_pool))
        else:
            args = args + ((), ())
        args = args + ((jnp.asarray(gmaps),) if tiled else ((),))
        flat = np.asarray(prog(*args))
        H, W = sps.height, sps.width
        Hc, Wc = H >> sps.vshift1, W >> sps.hshift1
        out = []
        for i in range(len(fs_list)):
            f = flat[i].astype(np.int32)
            out.append([f[:H * W].reshape(H, W),
                        f[H * W:H * W + Hc * Wc].reshape(Hc, Wc),
                        f[H * W + Hc * Wc:].reshape(Hc, Wc)])
        return out, fmask
