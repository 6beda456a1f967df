"""Batched frame reconstruction sharded over a device mesh.

One jitted dispatch reconstructs a whole wave of independent pictures
(parallel/frames.py): input tensors carry a leading `frame` axis that
shard_map splits across the mesh's `frame` dimension; each device runs
the complete single-frame XLA program (residual assembly -> intra
wavefront scan -> in-loop filters) on its shard. Collectives are not
needed — frames are independent — so scaling rides ICI-free data
parallelism; the same batching amortizes dispatch overhead on one chip.

This is the production analogue of the reference's frame-thread pool
(pthread_frame.c:325): decoder clones become frame shards, progress
gating becomes wave scheduling (frames.py).
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
        self.n_frame = int(mesh.shape["frame"])
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

    def _stack_wave(self, fs_list):
        from ..models.pipeline import pack_frame
        pfs = [pack_frame(fs) for fs in fs_list]
        grids = [self._intra_grid(pf, fs)
                 for pf, fs in zip(pfs, fs_list)]
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

    # ---- device program ---------------------------------------------------
    def _program(self, key, sps, sizes, isizes, fmask, has_sm, n_levels):
        if key in self._progs:
            return self._progs[key]
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        from ..ops.idct import residual_bucket, scatter_blocks
        from ..models.pipeline import _intra_scan
        from ..ops.filters_jax import apply_filters_device

        H, W = sps.height, sps.width
        hs, vs = sps.hshift1, sps.vshift1
        Hc, Wc = H >> vs, W >> hs
        bd, bdc = sps.bit_depth, sps.bit_depth_chroma
        cs = 1 << sps.log2_ctb
        strong = bool(sps.strong_intra_smoothing)

        def one_frame(planes0, res, intra, fargs):
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
            xs = {s: intra[s] for s in isizes}
            if isizes and n_levels:
                planes = _intra_scan(planes0, res_planes, xs, isizes,
                                     bd, strong)
            else:
                planes = planes0
            y = planes[0, :H, :W]
            cb = planes[1, :Hc, :Wc]
            cr = planes[2, :Hc, :Wc]
            if fmask:
                y, cb, cr = apply_filters_device(
                    y, cb, cr, *fargs, bd=bd, bdc=bdc, cs=cs,
                    do_deblock=bool(fmask & 1), do_sao=bool(fmask & 2))
            dt = jnp.uint8 if bd <= 8 else jnp.uint16
            return jnp.concatenate([y.astype(dt).reshape(-1),
                                    cb.astype(dt).reshape(-1),
                                    cr.astype(dt).reshape(-1)])

        def block(planes0, res, intra, fargs):
            # per-device shard: loop the local frames (static count)
            nloc = planes0.shape[0]
            outs = []
            for i in range(nloc):
                fa = tuple(f[i] for f in fargs) if fargs is not None \
                    else None
                outs.append(one_frame(
                    planes0[i],
                    {s: {k: v[i] for k, v in res[s].items()}
                     for s in sizes},
                    {s: {k: v[i] for k, v in intra[s].items()}
                     for s in isizes},
                    fa))
            return jnp.stack(outs)

        spec_in = (P("frame"),
                   {s: {k: P("frame") for k in
                        (("levels", "qp", "flags", "plane", "bx", "by") +
                         (("sm",) if has_sm else ()))} for s in sizes},
                   {s: {k: P("frame") for k in
                        ("valid", "plane", "x", "y", "mode", "avail",
                         "filt")} for s in isizes})
        if fmask:
            spec_in = spec_in + (tuple(P("frame") for _ in range(22)),)
            fn = shard_map(block, mesh=self.mesh, in_specs=spec_in,
                           out_specs=P("frame"))
        else:
            fn = shard_map(lambda p, r, i: block(p, r, i, None),
                           mesh=self.mesh, in_specs=spec_in,
                           out_specs=P("frame"))
        prog = jax.jit(fn)
        self._progs[key] = prog
        return prog

    # ---- public -----------------------------------------------------------
    def reconstruct_wave(self, fs_list):
        """All pictures share one SPS and are mutually independent.
        Returns per-picture [Y, Cb, Cr] int32 host planes (pre- or
        post-filter depending on the device-filter verdict; the caller
        applies host filters when fmask == 0 and filters are wanted)."""
        import jax.numpy as jnp
        sps = fs_list[0].sps
        (pfs, npad, res, intra, planes0, fstack, fmask,
         n_levels) = self._stack_wave(fs_list)
        sizes = tuple(sorted(res))
        isizes = tuple(sorted(intra))
        has_sm = any("sm" in res[s] for s in sizes)
        key = (sps.sps_id, sps.width, sps.height, sizes, isizes,
               tuple(res[s]["qp"].shape[1] for s in sizes),
               tuple(intra[s]["x"].shape[2] for s in isizes),
               n_levels, fmask, has_sm, npad)
        prog = self._program(key, sps, sizes, isizes, fmask, has_sm,
                             n_levels)
        args = (jnp.asarray(planes0),
                {s: {k: jnp.asarray(v) for k, v in res[s].items()}
                 for s in sizes},
                {s: {k: jnp.asarray(v) for k, v in intra[s].items()}
                 for s in isizes})
        if fmask:
            args = args + (tuple(jnp.asarray(f) for f in fstack),)
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
