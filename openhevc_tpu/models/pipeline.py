"""JAX/TPU reconstruction pipeline.

Host side (pack_frame): FrameSymbols -> static-shaped device tensors:
  - residual TU buckets per size (levels, qp, flags, block coords)
  - intra jobs grouped into *dependency levels* (exact wavefront: a TU's
    level = 1 + max level over the blocks its available reference samples
    come from). Within a level all TUs are independent -> batched.
Device side (jitted): residual assembly (ops/idct.py, MXU matmuls) ->
lax.scan over dependency levels of batched intra prediction
(ops/intra.py) -> output planes.

All planes live in a single int32 stack [4, H, W] (chroma occupies the
top-left quadrant; plane 3 is a write-off target for padded lanes), so one
gather/scatter indexes any plane.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..symbols import FrameSymbols
from ..ops.idct import residual_bucket, scatter_blocks
from ..ops.intra import predict_batch

SIZES = (4, 8, 16, 32)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@dataclass
class PackedFrame:
    width: int
    height: int
    bit_depth: int
    strong_smoothing: bool
    planes0: np.ndarray          # [4, H, W] int32, PCM prefilled
    res: dict                    # size -> dict of arrays (or None)
    intra: dict                  # size -> dict of [L, cap, ...] arrays
    n_levels: int


def pack_frame(fs: FrameSymbols) -> PackedFrame:
    sps = fs.sps
    W, H = sps.width, sps.height
    bd = sps.bit_depth
    planes0 = np.zeros((4, H, W), np.int32)
    for p in fs.pcm_blocks:
        s = p.size
        planes0[0, p.y:p.y + s, p.x:p.x + s] = p.samples_y
        cs_h, cs_v = s >> sps.hshift1, s >> sps.vshift1
        cy, cx = p.y >> sps.vshift1, p.x >> sps.hshift1
        planes0[1, cy:cy + cs_v, cx:cx + cs_h] = p.samples_cb
        planes0[2, cy:cy + cs_v, cx:cx + cs_h] = p.samples_cr

    # ---- residual buckets -------------------------------------------------
    res = {}
    by_size = {s: [] for s in SIZES}
    for cb in fs.coeff_blocks:
        by_size[1 << cb.log2_size].append(cb)
    for s in SIZES:
        blocks = by_size[s]
        if not blocks:
            res[s] = None
            continue
        cap = _round_up(len(blocks), 16)
        levels = np.zeros((cap, s, s), np.int32)
        qp = np.zeros(cap, np.int32)
        flags = np.zeros((cap, 5), bool)  # dst, tskip, bypass, rd_vert, rd_on
        plane = np.full(cap, 3, np.int32)
        bx = np.zeros(cap, np.int32)
        by = np.zeros(cap, np.int32)
        for i, cb in enumerate(blocks):
            levels[i] = cb.levels
            qp[i] = cb.qp
            flags[i] = (cb.is_dst, cb.transform_skip, cb.transquant_bypass,
                        cb.rdpcm_mode == 1, cb.rdpcm_mode >= 0)
            plane[i] = cb.plane
            bx[i] = cb.x // s
            by[i] = cb.y // s
        res[s] = dict(levels=levels, qp=qp, flags=flags, plane=plane,
                      bx=bx, by=by)

    # ---- intra dependency levels ------------------------------------------
    h4, w4 = H >> 2, W >> 2
    level_map = np.zeros((3, h4, w4), np.int32)
    job_level = []
    for job in fs.intra_jobs:
        s = job.size
        x, y, pl = job.x, job.y, job.plane
        deps = 0
        av = job.avail
        # ref sample coords (plane coords)
        coords = []
        for i in range(2 * s):
            if av[i]:
                coords.append((x - 1, y + 2 * s - 1 - i))
        if av[2 * s]:
            coords.append((x - 1, y - 1))
        for j in range(2 * s):
            if av[2 * s + 1 + j]:
                coords.append((x + j, y - 1))
        for (cx, cy) in coords:
            deps = max(deps, level_map[pl, cy >> 2, cx >> 2])
        lvl = deps + 1
        n4 = max(1, s >> 2)
        level_map[pl, y >> 2:(y >> 2) + n4, x >> 2:(x >> 2) + n4] = lvl
        job_level.append(lvl)
    n_levels = max(job_level, default=0)

    intra = {}
    for s in SIZES:
        jobs = [(lvl, j) for lvl, j in zip(job_level, fs.intra_jobs)
                if j.size == s]
        if not jobs:
            intra[s] = None
            continue
        per_level = {}
        for lvl, j in jobs:
            per_level.setdefault(lvl - 1, []).append(j)
        cap = _round_up(max(len(v) for v in per_level.values()), 8)
        L = n_levels
        n_ref = 4 * s + 1
        arr = dict(
            valid=np.zeros((L, cap), np.int32),
            plane=np.full((L, cap), 3, np.int32),
            x=np.zeros((L, cap), np.int32),
            y=np.zeros((L, cap), np.int32),
            mode=np.zeros((L, cap), np.int32),
            avail=np.zeros((L, cap, n_ref), bool),
            filt=np.zeros((L, cap), bool),
        )
        for lvl, js in per_level.items():
            for i, j in enumerate(js):
                arr["valid"][lvl, i] = 1
                arr["plane"][lvl, i] = j.plane
                arr["x"][lvl, i] = j.x
                arr["y"][lvl, i] = j.y
                arr["mode"][lvl, i] = j.mode
                arr["avail"][lvl, i] = j.avail
                arr["filt"][lvl, i] = j.filter_refs
        intra[s] = arr
    return PackedFrame(width=W, height=H, bit_depth=bd,
                       strong_smoothing=bool(sps.strong_intra_smoothing),
                       planes0=planes0, res=res, intra=intra,
                       n_levels=n_levels)


class JaxEngine:
    """Per-shape jit cache around the packed pipeline."""

    def __init__(self):
        self._cache = {}

    def reconstruct(self, fs: FrameSymbols, ref_planes=None):
        pf = pack_frame(fs)
        H, W = pf.height, pf.width
        hs, vs = fs.sps.hshift1, fs.sps.vshift1
        if fs.inter_pbs:
            # inter MC currently runs via the scalar reference into the
            # initial planes (device gather kernels are the next step)
            from ..ops.mc_np import predict_inter_block
            from .recon_np import residual_planes
            res = residual_planes(fs)
            maxv = (1 << pf.bit_depth) - 1
            for pb in fs.inter_pbs:
                l0p = ref_planes.get(pb.l0[2]) if pb.l0 else None
                l1p = ref_planes.get(pb.l1[2]) if pb.l1 else None
                pred = predict_inter_block(l0p, l1p, pb, pf.bit_depth,
                                           hs, vs)
                x, y, w, h = pb.x, pb.y, pb.w, pb.h
                pf.planes0[0, y:y + h, x:x + w] = np.clip(
                    pred[0] + res[0][y:y + h, x:x + w], 0, maxv)
                cx, cy = x >> hs, y >> vs
                cw2, ch2 = w >> hs, h >> vs
                for c in (1, 2):
                    pf.planes0[c, cy:cy + ch2, cx:cx + cw2] = np.clip(
                        pred[c] + res[c][cy:cy + ch2, cx:cx + cw2], 0, maxv)
        planes = self._run(pf)
        y = np.asarray(planes[0, :H, :W])
        u = np.asarray(planes[1, :H >> vs, :W >> hs])
        v = np.asarray(planes[2, :H >> vs, :W >> hs])
        # in-loop filters currently run via the scalar reference
        # (device deblock/SAO stencil kernels are the next optimization)
        from .recon_np import apply_loop_filters
        return apply_loop_filters([y, u, v], fs)

    def _run(self, pf: PackedFrame):
        bd = pf.bit_depth
        planes = jnp.asarray(pf.planes0)
        res_planes = jnp.zeros_like(planes)
        # residual assembly (fully parallel)
        for s in SIZES:
            b = pf.res[s]
            if b is None:
                continue
            fl = b["flags"]
            r = residual_bucket(jnp.asarray(b["levels"]),
                                jnp.asarray(b["qp"]),
                                jnp.asarray(fl[:, 0]), jnp.asarray(fl[:, 1]),
                                jnp.asarray(fl[:, 2]), jnp.asarray(fl[:, 3]),
                                jnp.asarray(fl[:, 4]), s=s, bit_depth=bd)
            res_planes = scatter_blocks(res_planes, r,
                                        jnp.asarray(b["plane"]),
                                        jnp.asarray(b["bx"]),
                                        jnp.asarray(b["by"]), s=s)
        # intra wavefront scan
        if pf.n_levels:
            sizes = tuple(s for s in SIZES if pf.intra[s] is not None)
            xs = {s: {k: jnp.asarray(v) for k, v in pf.intra[s].items()}
                  for s in sizes}
            planes = _intra_scan(planes, res_planes, xs, sizes, bd,
                                 pf.strong_smoothing)
        return planes


@partial(jax.jit, static_argnames=("sizes", "bit_depth", "strong"))
def _intra_scan(planes, res_planes, xs, sizes, bit_depth, strong):
    def body(pl, level_arrays):
        for s in sizes:
            a = level_arrays[s]
            pl = predict_batch(pl, res_planes, a["valid"], a["plane"],
                               a["x"], a["y"], a["mode"], a["avail"],
                               a["filt"], s=s, bit_depth=bit_depth,
                               strong_smoothing=strong)
        return pl, None
    planes, _ = jax.lax.scan(body, planes, xs)
    return planes
