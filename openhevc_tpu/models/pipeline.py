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

import os
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


def _round_bucket(n, base):
    """Geometric shape bucket (pow2 / 1.5*pow2) — mirrors the native
    packer's round_bucket; bounds jit-signature churn."""
    if n <= base:
        return base
    p = base
    while p < n:
        p <<= 1
    half = p >> 1
    mid = half + (half >> 1)
    return mid if n <= mid else p


def _round_fine(n, base):
    """1/16-octave bucket: round up to a multiple of 2^(floor(log2 n)-4)
    (min `base`). Bounds distinct static shapes to 16 per octave while
    wasting <= ~6% padding — used for the big wire buffers (payload
    arena, intra meta, escapes) where the coarse pow2/1.5-pow2 buckets
    cost real megabytes at 4K (BENCH probe: payload 4.4 -> 6.0 MiB).
    Mirrored by round_fine in native/hevcparse.cc."""
    if n <= base:
        return base
    step = 1 << max((n - 1).bit_length() - 5, 0)
    return -(-n // step) * step


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
    inter: dict | None = None    # dense MC fields (see _pack_inter)
    hshift: int = 1              # chroma subsampling shifts (sps)
    vshift: int = 1
    ccp: np.ndarray | None = None  # [2, Hc, Wc] int8 res_scale_val map


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

    if fs.native_raw is not None:
        res, intra, n_levels = _pack_from_raw(fs)
    else:
        res, intra, n_levels = _pack_from_objects(fs, W, H)
    return PackedFrame(width=W, height=H, bit_depth=bd,
                       strong_smoothing=bool(sps.strong_intra_smoothing),
                       planes0=planes0, res=res, intra=intra,
                       n_levels=n_levels,
                       hshift=sps.hshift1, vshift=sps.vshift1)


def _sm_for(sl, s, mid, tskip):
    """Per-block dequant scaling matrices [cap, s, s] int32, or None when
    scaling lists are off. Index 6 = flat 16 (used by padding rows and by
    transform-skip TBs >4x4, the hevc_cabac.c:1484 gate)."""
    if sl is None:
        return None
    log2s = int(np.log2(s))
    table = np.stack([sl.matrix(log2s, m) for m in range(6)] +
                     [np.full((s, s), 16, np.int32)])
    use = np.where(tskip, 6, mid) if log2s > 2 else mid
    return table[use]


def _pack_from_objects(fs: FrameSymbols, W, H):
    """Reference packing path over Python object lists."""
    res = {}
    sl = fs.active_scaling()
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
        mid = np.full(cap, 6, np.int32)
        for i, cb in enumerate(blocks):
            levels[i] = cb.levels
            qp[i] = cb.qp
            flags[i] = (cb.is_dst, cb.transform_skip, cb.transquant_bypass,
                        cb.rdpcm_mode == 1, cb.rdpcm_mode >= 0)
            plane[i] = cb.plane
            bx[i] = cb.x // s
            by[i] = cb.y // s
            mid[i] = cb.matrix_id
        res[s] = dict(levels=levels, qp=qp, flags=flags, plane=plane,
                      bx=bx, by=by, sm=_sm_for(sl, s, mid, flags[:, 1]))

    # ---- intra dependency levels ------------------------------------------
    h4, w4 = H >> 2, W >> 2
    level_map = np.zeros((3, h4, w4), np.int32)
    job_level = []
    for job in fs.intra_jobs:
        s = job.size
        x, y, pl = job.x, job.y, job.plane
        deps = 0
        av = job.avail
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
    return res, intra, n_levels


def _pack_from_raw(fs: FrameSymbols):
    """Vectorized packing over the native parser's flat arrays."""
    raw = fs.native_raw
    cm = raw["cb_meta"]          # [N, 8] plane,x,y,log2,qp,flags,lvl_off
    lv_arena = raw["cb_levels"]
    res = {}
    sl = fs.active_scaling()
    for s in SIZES:
        log2s = int(np.log2(s))
        sel = np.nonzero(cm[:, 3] == log2s)[0]
        if not len(sel):
            res[s] = None
            continue
        n = len(sel)
        cap = _round_up(n, 16)
        offs = cm[sel, 6]
        gather = offs[:, None] + np.arange(s * s)[None, :]
        levels = np.zeros((cap, s, s), np.int32)
        levels[:n] = lv_arena[gather].reshape(n, s, s)
        qp = np.zeros(cap, np.int32)
        qp[:n] = cm[sel, 4]
        fl = cm[sel, 5]
        flags = np.zeros((cap, 5), bool)
        flags[:n, 0] = (fl & 1) != 0
        flags[:n, 1] = (fl & 2) != 0
        flags[:n, 2] = (fl & 4) != 0
        flags[:n, 3] = (fl & 16) != 0
        flags[:n, 4] = (fl & 8) != 0
        plane = np.full(cap, 3, np.int32)
        plane[:n] = cm[sel, 0]
        bx = np.zeros(cap, np.int32)
        by = np.zeros(cap, np.int32)
        bx[:n] = cm[sel, 1] // s
        by[:n] = cm[sel, 2] // s
        mid = np.full(cap, 6, np.int32)
        mid[:n] = 3 * ((fl & 32) != 0) + cm[sel, 0]
        res[s] = dict(levels=levels, qp=qp, flags=flags, plane=plane,
                      bx=bx, by=by, sm=_sm_for(sl, s, mid, flags[:, 1]))

    im = raw["ij_meta"]          # [N, 8] plane,x,y,size,mode,filt,level
    iav = raw["ij_avail"]        # [N, 132]
    n_levels = raw["n_levels"]
    # per-level schedule: list of {size: job arrays}, caps padded to pow2
    # so the jitted per-level kernel recompiles only per (size, cap) pair
    sched = [dict() for _ in range(n_levels)]
    for s in SIZES:
        sel = np.nonzero(im[:, 3] == s)[0]
        if not len(sel):
            continue
        lv = im[sel, 6] - 1
        order = np.argsort(lv, kind="stable")
        sel = sel[order]
        sorted_lv = lv[order]
        starts = np.searchsorted(sorted_lv, np.arange(n_levels + 1))
        n_ref = 4 * s + 1
        for l in range(n_levels):
            a, b = int(starts[l]), int(starts[l + 1])
            if a == b:
                continue
            n = b - a
            cap = 1 << max(3, (n - 1).bit_length())
            idx = sel[a:b]
            plane = np.full(cap, 3, np.int32)
            plane[:n] = im[idx, 0]
            xs = np.zeros(cap, np.int32)
            ys = np.zeros(cap, np.int32)
            mode = np.zeros(cap, np.int32)
            filt = np.zeros(cap, bool)
            avail = np.zeros((cap, n_ref), bool)
            valid = np.zeros(cap, np.int32)
            xs[:n] = im[idx, 1]
            ys[:n] = im[idx, 2]
            mode[:n] = im[idx, 4]
            filt[:n] = im[idx, 5] != 0
            avail[:n] = iav[idx, :n_ref] != 0
            valid[:n] = 1
            sched[l][s] = dict(valid=valid, plane=plane, x=xs, y=ys,
                               mode=mode, avail=avail, filt=filt)
    # consolidate per-(size, cap) groups into stacked arrays so the whole
    # schedule ships to the device as a handful of buffers
    groups = {}
    order = []   # per level: list of (group_key, index_in_group, s)
    for level in sched:
        steps = []
        for s, a in level.items():
            key = (s, len(a["valid"]))
            g = groups.setdefault(key, [])
            steps.append((key, len(g), s))
            g.append(a)
        order.append(steps)
    stacked = {}
    for key, lst in groups.items():
        stacked[key] = {k: np.stack([a[k] for a in lst]) for k in lst[0]}
    return res, {"stacked": stacked, "order": order}, n_levels


def motion_diff2(pf4, slot, mv):
    """Lossless sparse encoding of the dense per-4x4 motion grids for
    the H2D wire: the 2-D second difference of a piecewise-constant-
    on-PU-rectangles field is nonzero only at PU corners, so the seven
    fields (pf, slot0/1, mv l0/l1 x/y) ship as (flat index, 7 x int16)
    pairs — ~18 B per corner instead of ~18 B per 4x4 block (the dense
    grids are ~2.4 MB per 1080p frame and dominated ra_main's wire
    budget). Device inverse: scatter + two int32 cumsums + int16 wrap
    (_motion_grids_dev). Wrapping int16 diffs are exact under mod-2^16
    arithmetic."""
    h4, w4 = pf4.shape
    F = np.empty((7, h4, w4), np.int16)
    F[0] = pf4
    F[1] = slot[0]
    F[2] = slot[1]
    F[3] = mv[:, :, 0, 0]
    F[4] = mv[:, :, 0, 1]
    F[5] = mv[:, :, 1, 0]
    F[6] = mv[:, :, 1, 1]
    D = F.copy()
    D[:, 1:, :] -= F[:, :-1, :]
    D2 = D.copy()
    D2[:, :, 1:] -= D[:, :, :-1]
    flat = D2.reshape(7, -1)
    nz = np.nonzero(np.any(flat != 0, axis=0))[0]
    n = len(nz)
    # VERY coarse caps: every cap is a distinct _inter_prefill program
    # and program loads cost ~10s+ over the tunneled runtime
    for cap in (4096, 16384, 65536):
        if n <= cap:
            break
    else:
        cap = _round_up(n, 65536)
    idx = np.full(cap, 1 << 30, np.int32)      # padding -> dropped
    idx[:n] = nz
    vals = np.zeros((cap, 7), np.int16)
    vals[:n] = flat[:, nz].T
    return dict(idx=idx, vals=vals, h4=h4, w4=w4)


def _motion_grids_dev(midx, mvals, h4: int, w4: int):
    """Device inverse of motion_diff2: (pf4 [h4,w4], mv [h4,w4,2,2],
    slot [2,h4,w4]) int32 grids."""
    G = jnp.zeros((7, h4 * w4), jnp.int32).at[:, midx].set(
        mvals.T.astype(jnp.int32), mode="drop")
    G = jnp.cumsum(G.reshape(7, h4, w4), axis=1)
    G = jnp.cumsum(G, axis=2)
    G = ((G + (1 << 15)) & 0xFFFF) - (1 << 15)   # int16 wrap = exact
    pf4 = G[0]
    slot = G[1:3]
    mv = jnp.stack([jnp.stack([G[3], G[4]], axis=-1),
                    jnp.stack([G[5], G[6]], axis=-1)], axis=-2)
    return pf4, mv, slot


def weight_grids(fs):
    """Per-4x4 weighted-prediction grids from ref_idx: {wg, og
    [2, 3, h4, w4] int16, denoms (luma, chroma)} — the weighted uni/bi
    combine inputs (hevcdsp_template.c put_hevc_*_uni_w/bi_w). None
    when the picture carries no prediction-weight table."""
    if fs.weights is None:
        return None
    mc = fs.motion
    wt = fs.weights
    h4, w4 = mc.pred_flag.shape
    ridx = np.asarray(mc.ref_idx, np.int32)   # [h4,w4,2]
    wg = np.zeros((2, 3, h4, w4), np.int16)
    og = np.zeros((2, 3, h4, w4), np.int16)
    for lx, key in enumerate(("l0", "l1")):
        entries = wt.get(key)
        if not entries:
            continue
        r = np.clip(ridx[:, :, lx], 0, len(entries) - 1)
        for c in range(3):
            wl = np.array([e[0] if c == 0 else e[2][c - 1]
                           for e in entries], np.int32)
            ol = np.array([e[1] if c == 0 else e[3][c - 1]
                           for e in entries], np.int32)
            wg[lx, c] = wl[r]
            og[lx, c] = ol[r]
    return dict(wg=wg, og=og, denoms=(wt["luma_log2_denom"],
                                      wt["chroma_log2_denom"]))


@partial(jax.jit, static_argnames=("layout",))
def _split_upload(buf, *, layout):
    """Device-side split of one coalesced upload buffer into the
    per-segment arrays: layout = ((dtype_name, shape, byte_off,
    nbytes), ...) — static, so distinct layouts are distinct (tiny)
    programs. Each segment is a static slice + bitcast; the copies are
    HBM-local and cheap. Motivation: on the tunneled runtime every
    host->device transfer pays ~8 ms fixed once any D2H has occurred
    in the process (the runtime drops to a ~40 MB/s synchronized
    mode), so a frame's 6-10 small uploads cost ~10x more as separate
    device_puts than as one buffer."""
    outs = []
    for dt, shape, off, nb in layout:
        seg = buf[off:off + nb]
        d = np.dtype(dt)
        if d.itemsize > 1:
            seg = jax.lax.bitcast_convert_type(
                seg.reshape(-1, d.itemsize), jnp.dtype(d))
        elif dt == "bool":
            seg = seg.astype(jnp.bool_)
        elif dt != "uint8":
            seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(d))
        outs.append(seg.reshape(shape))
    return tuple(outs)


def upload_group(arrs, wire=None):
    """Coalesce host numpy arrays into ONE device transfer; returns
    device arrays in input order (see _split_upload). Segments are
    aligned to their itemsize."""
    layout = []
    parts = []
    off = 0
    for a in arrs:
        a = np.ascontiguousarray(a)
        dt = a.dtype
        name = "bool" if dt == np.bool_ else dt.name
        pad = (-off) % max(dt.itemsize, 1)
        if pad:
            parts.append(np.zeros(pad, np.uint8))
            off += pad
        b = a.view(np.uint8).reshape(-1)
        layout.append((name, a.shape, off, b.size))
        parts.append(b)
        off += b.size
    buf = parts[0] if len(parts) == 1 else np.concatenate(parts)
    if wire is not None:
        wire.h2d(buf.nbytes)
    return _split_upload(jnp.asarray(buf), layout=tuple(layout))


class WireStats:
    """Host<->device byte accounting (BASELINE.md: the tunneled wire is
    THE budget). Counts intended payload bytes of the decode path's
    uploads/downloads; surfaced per config by bench.py."""

    def __init__(self):
        self.h2d_bytes = 0
        self.d2h_bytes = 0

    def h2d(self, n):
        self.h2d_bytes += int(n)

    def d2h(self, n):
        self.d2h_bytes += int(n)

    def summary(self, frames=None):
        out = {"h2d_bytes": self.h2d_bytes, "d2h_bytes": self.d2h_bytes}
        if frames:
            out["h2d_bytes_per_frame"] = round(self.h2d_bytes / frames)
            out["d2h_bytes_per_frame"] = round(self.d2h_bytes / frames)
        return out


class JaxEngine:
    """Per-shape jit cache around the packed pipeline."""

    # VMEM budget gate for the fused whole-frame intra kernel (bytes of
    # recon+residual buffers; beyond this fall back to the per-level path
    # until the banded variant lands)
    FUSED_VMEM_BUDGET = 12 * 2 ** 20
    # plane-size gate for the all-phase-pair MC prefilter (~830 MB/ref
    # at 4K 4:2:0 across the three planes). 4K now takes the pair path
    # too: the taps-mode stage-2 program (8 unrolled frame-sized
    # gathers per plane per list) stalled the tunnel's remote-compile
    # service for >45 min at 4K, while the single-gather pair program
    # compiles fine; HBM affords ~4 in-flight 4K refs under the LRU
    # budget below (v5e: 16 GB)
    MC_PAIRS_MAX_PIXELS = 8_500_000
    # LRU byte budget for the per-reference prefilter cache
    HF_CACHE_BUDGET = 5200 * 2 ** 20

    def __init__(self):
        self._cache = {}
        self._fetch_pool = FetchPool()
        self.wire = WireStats()
        # high-water-mark static layout (caps per size + intra-meta npad):
        # every distinct (caps, npad) tuple is a separate XLA program and
        # remote compiles cost ~60-90 s each on the tunneled runtime —
        # without the HWM a 1080p hierarchical-B stream produced 13
        # distinct _inter_prefill programs in 16 frames (r04 probe).
        # Padding rows are nibble-cheap on the wire; signatures stabilize
        # after the first few frames. HWMs are kept PER FRAME CLASS
        # (intra vs inter, x scaling-list layout): one dense I-frame
        # must not inflate every later inter frame's upload to I-frame
        # caps for the engine's lifetime (that padding was ~1 MB/frame
        # on ra_main 1080p — the r04 advisor finding).
        self._cap_hwm = {}
        self._npad_hwm = {}
        # False for decoders whose outputs are never displayed (SHVC
        # base layer): skips the background D2H output fetch
        self.fetch_outputs = True
        # DecoderConfig.pack_output override (None = env/default)
        self.pack_output = None
        import os as _osd
        # debug: block after each device stage and record wall times
        self._sync_debug = _osd.environ.get("OPENHEVC_SYNC_TIMERS") == "1"
        self.sync_times = {}
        # persistent XLA compile cache: shape buckets are coarse
        # (256-block / 1024-meta), so a production decode hits a handful
        # of programs — cache them across processes like the test suite
        # does (first tunneled TPU compile is ~20-40 s each)
        import os as _os
        import jax as _jax
        if (_os.environ.get("JAX_COMPILATION_CACHE_DIR") is None and
                _jax.config.jax_compilation_cache_dir is None):
            d = _os.path.join(_os.path.expanduser("~"), ".cache",
                              "openhevc_tpu_xla")
            try:
                _os.makedirs(d, exist_ok=True)
                _jax.config.update("jax_compilation_cache_dir", d)
                _jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1)
                _jax.config.update(
                    "jax_persistent_cache_min_entry_size_bytes", 0)
            except Exception:
                pass
        # per-reference-plane MC prefilter cache: planes-object ->
        # (weakref, device prefilter stack). A reference picture's
        # prefiltering runs ONCE, not once per frame that references
        # it; LRU-evicted under a byte budget (see _hf_stack).
        from collections import OrderedDict
        self._hf_cache = OrderedDict()

    def _dbg(self, name, x):
        """When OPENHEVC_SYNC_TIMERS=1: block on the device value and
        accumulate wall time per stage (pipeline stall diagnosis)."""
        if self._sync_debug:
            import time as _t
            import jax as _jax
            t0 = _t.perf_counter()
            _jax.block_until_ready(x)
            self.sync_times[name] = self.sync_times.get(name, 0.0) + \
                (_t.perf_counter() - t0)
            self.sync_times[name + "_n"] = \
                self.sync_times.get(name + "_n", 0) + 1
        return x

    def _stabilize_caps(self, arena4, arena16, escs, caps, klass=0):
        """Repad the packed residual arenas to this engine's high-water
        -mark layout so the (static) caps tuple — and with it the
        _inter_prefill/_frame_fused jit signature — stabilizes after the
        first few frames of a stream. Padding convention mirrors the
        packers exactly: 0x88 nibble bytes (biased zero levels), FAR
        coords with qpf 0 sideband rows, zero scaling-matrix rows,
        (-1, -1) escape pairs (all dropped on device). The HWM is
        per (klass, scaling-layout) so e.g. a dense I-frame and the
        following B-frames stabilize to separate, appropriately sized
        programs. Note: stabilization can turn a previously-empty
        bucket (cap 0) into an all-padding one — the device path
        relies on zero residual + the dropped scatter for those rows."""
        key = (klass,) + tuple(c[2] for c in caps)
        hwm = self._cap_hwm.setdefault(key, [[0, 0] for _ in caps] + [0])
        new = []
        changed = False        # layout differs from this frame's caps
        for i, (s, cap, sm, n_esc) in enumerate(caps):
            hwm[i][0] = max(hwm[i][0], cap)
            hwm[i][1] = max(hwm[i][1], n_esc)
            new.append((s, hwm[i][0], sm, hwm[i][1]))
            changed |= (hwm[i][0] != cap or hwm[i][1] != n_esc)
        new = tuple(new)
        # payload arena: tail-pad to the class HWM length (per-TU
        # prefix lengths live in the sideband; padding bytes are never
        # addressed because padded rows carry cnt = 0)
        hwm[-1] = max(hwm[-1], arena4.size)
        if arena4.size != hwm[-1]:
            a4 = np.zeros(hwm[-1], np.uint8)
            a4[:arena4.size] = arena4
            arena4 = a4
        if not changed:
            return arena4, arena16, escs, new
        p16, pe = [], []
        off = eoff = 0
        for (s, cap, sm, n_esc), (_s2, cap2, _sm2, esc2) in zip(caps, new):
            for f in range(4):           # bx, by, qpf, cw segments
                if cap:
                    p16.append(arena16[off:off + cap])
                    off += cap
                if cap2 != cap:
                    p16.append(np.full(cap2 - cap,
                                       FAR if f < 2 else 0, np.int16))
            if sm:                               # scaling-matrix segment
                ss = s * s
                if cap:
                    p16.append(arena16[off:off + cap * ss])
                    off += cap * ss
                if cap2 != cap:
                    # padding rows' dequant output is dropped (FAR
                    # coords) — zero matrices are fine
                    p16.append(np.zeros((cap2 - cap) * ss, np.int16))
            if n_esc:
                pe.append(escs[eoff * 2:(eoff + n_esc) * 2])
                eoff += n_esc
            if esc2 != n_esc:
                pe.append(np.full((esc2 - n_esc) * 2, -1, np.int32))
        arena16 = np.concatenate(p16) if p16 else np.zeros(1, np.int16)
        escs = np.concatenate(pe) if pe else np.zeros(2, np.int32)
        return arena4, arena16, escs, new

    def _stabilize_npad(self, meta, npad, klass=0):
        """Same idea for the intra-meta bucket width (zero rows are the
        packers' padding convention; the kernel bounds work by the
        dynamic count nn). Per frame class, like _stabilize_caps."""
        hwm = self._npad_hwm.get(klass, 0)
        if npad < hwm:
            meta = np.concatenate(
                [meta, np.zeros((meta.shape[0], hwm - npad), meta.dtype)],
                axis=1)
            npad = hwm
        else:
            self._npad_hwm[klass] = npad
        return meta, npad

    def _ref_plane_dev(self, planes_obj, c, bd):
        """Plane c of a reference picture as a DEVICE int32 array.
        Device-resident decoded pictures (LazyPlanes keeping their flat
        output alive, DevicePlanes from the SHVC upsampler) are sliced
        on device — zero wire bytes; host-only pictures (np engine,
        concealment frames) upload once."""
        pd = getattr(planes_obj, "_planes_dev", None)
        if pd is not None:
            return pd[c].astype(jnp.int32)
        flat = getattr(planes_obj, "_dev", None)
        if flat is not None:
            H, W, Hc, Wc = planes_obj._dims
            return _slice_plane(flat, c=c, H=H, W=W, Hc=Hc, Wc=Wc)
        src = np.asarray(planes_obj[c], np.int32)
        self.wire.h2d(src.nbytes)
        return jnp.asarray(src)

    def _hf_stack(self, pocs, ref_planes, c, bd, pairs=False):
        """Stage-1 MC prefilter stack for plane c of the listed
        reference pictures, R padded to a power of two to bound jit
        specializations: [R, P, Hp, wn] (tap mode) or
        [R, Py, Px, hn, wn] (all-phase-pair mode). Prefilter results
        are cached per decoded picture (keyed by the planes object), so
        a reference is filtered once no matter how many frames read
        it — and with the device-resident DPB the source plane never
        crosses the wire."""
        import weakref
        from ..ops.mc import mc_hprefilter, mc_prefilter_pairs
        if not pocs:
            return None
        entries = []
        for p in pocs:
            obj = ref_planes[p]
            # device-resident pictures (LazyPlanes `_dims`, DevicePlanes
            # `_planes_dev`) key the cache by OBJECT — obj[c] on them
            # would materialize the planes to host (a blocking D2H round
            # trip per frame that defeated the device-resident IL chain)
            dev_res = hasattr(obj, "_dims") or hasattr(obj, "_planes_dev")
            tgt = obj if dev_res else obj[c]
            key = (id(tgt), c, pairs)
            hit = self._hf_cache.get(key)
            if hit is not None and hit[0] is not None and \
                    hit[0]() is tgt:
                self._hf_cache.move_to_end(key)     # LRU refresh
                entries.append(hit[1])
                continue
            fn = mc_prefilter_pairs if pairs else mc_hprefilter
            dev = fn(self._ref_plane_dev(obj, c, bd),
                     bit_depth=bd, is_luma=(c == 0))
            try:
                wr = weakref.ref(tgt)
            except TypeError:
                wr = None
            self._hf_cache[key] = (wr, dev)
            entries.append(dev)
        # eviction is LRU + byte-budgeted: the all-pair stacks are
        # ~200 MB per 1080p picture, and callers (benchmarks, batch
        # consumers) may keep every decoded picture alive, so weakref
        # liveness alone cannot bound HBM here
        budget = self.HF_CACHE_BUDGET
        total = sum(int(np.prod(v[1].shape)) * v[1].dtype.itemsize
                    for v in self._hf_cache.values())
        while total > budget and len(self._hf_cache) > len(pocs) * 3:
            _, v = self._hf_cache.popitem(last=False)
            total -= int(np.prod(v[1].shape)) * v[1].dtype.itemsize
        R = len(entries)
        rp = 1 << (R - 1).bit_length()
        entries = entries + [entries[0]] * (rp - R)
        return jnp.stack(entries)

    def _fused_plan(self, fs):
        """None when the fused path is unavailable; ("whole", dims) when
        the whole frame fits VMEM; ("banded", dims, band_h, nbands)
        otherwise (the band_plan slide through VMEM scratch)."""
        import jax as _jax
        if _jax.default_backend() != "tpu":
            return None
        from ..ops.intra_fused import padded_dims, band_plan
        sps = fs.sps
        H, W = sps.height, sps.width
        Hc, Wc = H >> sps.vshift1, W >> sps.hshift1
        hl, wl = padded_dims(H, W)
        hc, wc = padded_dims(Hc, Wc)
        if (hl * wl + 2 * hc * wc) * 4 * 2 <= self.FUSED_VMEM_BUDGET:
            return ("whole", (hl, wl, hc, wc))
        plan = band_plan(H, W, Hc, Wc, sps.ctb_size, sps.vshift1)
        if plan is None:
            return None
        band_h, nb, hl, wl, hc, wc = plan
        return ("banded", (hl, wl, hc, wc), band_h, nb)

    def _fused_ok(self, fs) -> bool:
        return self._fused_plan(fs) is not None

    def reconstruct(self, fs: FrameSymbols, ref_planes=None):
        H, W = fs.sps.height, fs.sps.width
        hs, vs = fs.sps.hshift1, fs.sps.vshift1
        if self._fused_ok(fs):
            lazy = self._run_fused(fs, ref_planes or {})

            if lazy.device_filtered or (
                    fs.deblock_disabled and
                    not (fs.sao_luma or fs.sao_chroma)):
                # filters ran on device (or none apply): hand the caller
                # the deferred fetch so the device->host latency overlaps
                # later frames' parse
                return lazy
            y, u, v = lazy.get()
        else:
            pf = pack_frame(fs)
            pf.ccp = ccp_scale_map(fs)
            if fs.inter_pbs:
                pf.inter = self._pack_inter(fs, ref_planes or {})
            planes = self._run(pf)
            # in-loop filters on device when the whole-frame stencil
            # formulation is schedule-exact (ops/filters_jax.py) — the
            # scalar CTB schedule stays off the hot path
            want_filters = (not fs.deblock_disabled or fs.sao_luma or
                            fs.sao_chroma)
            if want_filters:
                from ..ops.filters_jax import (device_filters_ok,
                                               prep_filters)
                pff = prep_filters(fs) if device_filters_ok(fs) else None
                if pff is not None:
                    yv, uv, vv = self._device_filter_planes(planes, fs,
                                                            pff)
                    return [np.asarray(yv), np.asarray(uv),
                            np.asarray(vv)]
            y = np.asarray(planes[0, :H, :W])
            u = np.asarray(planes[1, :H >> vs, :W >> hs])
            v = np.asarray(planes[2, :H >> vs, :W >> hs])
        from .recon_np import apply_loop_filters
        return apply_loop_filters([y, u, v], fs)

    def _device_filter_planes(self, planes, fs, pff):
        """Whole-frame device deblock+SAO over the [4, H, W] stack."""
        from ..ops.filters_jax import apply_filters_device
        sps = fs.sps
        H, W = sps.height, sps.width
        Hc, Wc = H >> sps.vshift1, W >> sps.hshift1
        from ..ops.filters_jax import fargs_arrays
        fargs = tuple(jnp.asarray(a) for a in fargs_arrays(pff))
        return apply_filters_device(
            planes[0, :H, :W], planes[1, :Hc, :Wc], planes[2, :Hc, :Wc],
            *fargs, bd=sps.bit_depth, bdc=sps.bit_depth_chroma,
            cs=1 << sps.log2_ctb, do_deblock=pff["do_deblock"],
            do_sao=pff["do_sao"], hs=sps.hshift1, vs=sps.vshift1)

    def _run_fused(self, fs: FrameSymbols, ref_planes):
        """Whole-frame path around the fused Pallas intra kernel: residual
        scatter into padded per-plane buffers, optional inter/PCM prefill,
        one kernel invocation for every intra TU in decode order."""
        from ..ops.intra_fused import (pack_meta_native,
                                       pack_meta_objects, OY, OX,
                                       sort_meta_by_band,
                                       _bucket as _meta_bucket)
        sps = fs.sps
        H, W = sps.height, sps.width
        hs, vs = sps.hshift1, sps.vshift1
        Hc, Wc = H >> vs, W >> hs
        bd = sps.bit_depth
        smap = ccp_scale_map(fs)
        plan = self._fused_plan(fs)
        hl, wl, hc, wc = plan[1]
        banded = None if plan[0] == "whole" else (plan[2], plan[3])

        # ---- host-side frame prep (everything that crosses the wire) ------
        np_ = fs.native_pack
        if np_ is not None:
            arena4, arena16, escs, caps = (np_["arena4"], np_["arena16"],
                                           np_["esc"], np_["caps"])
        else:
            arena4, arena16, escs, caps = _pack_arena(_res_buckets(fs))
        klass = 1 if fs.inter_pbs else 0
        arena4, arena16, escs, caps = self._stabilize_caps(
            arena4, arena16, escs, caps, klass)

        if np_ is not None:
            meta, n = np_["meta"], np_["n"]
            npad = meta.shape[1]
        else:
            if fs.native_raw is not None:
                meta = pack_meta_native(fs.native_raw)
            else:
                meta = pack_meta_objects(fs.intra_jobs)
            n = meta.shape[1]
            npad = _meta_bucket(n)
            if npad != n:
                meta = np.concatenate(
                    [meta, np.zeros((meta.shape[0], npad - n),
                                    meta.dtype)], axis=1)
        meta, npad = self._stabilize_npad(meta, npad, klass)
        bounds = None
        if banded is not None:
            meta, bounds = sort_meta_by_band(meta, n, banded[0], vs,
                                             banded[1])
        # in-loop filters on device when the whole-frame formulation is
        # exact for this stream (ops/filters_jax.device_filters_ok)
        from ..ops.filters_jax import device_filters_ok, prep_filters
        fargs_np = None
        fmask = 0
        want_filters = (not fs.deblock_disabled or fs.sao_luma or
                        fs.sao_chroma)
        if want_filters and device_filters_ok(fs):
            pff = prep_filters(fs)
            if pff is not None:
                fmask = (1 if pff["do_deblock"] else 0) | \
                        (2 if pff["do_sao"] else 0)
                from ..ops.filters_jax import fargs_arrays
                fargs_np = [np.asarray(a) for a in fargs_arrays(pff)]

        inter = None
        fast_inter = False
        if fs.inter_pbs:
            inter = self._pack_inter(fs, ref_planes)
            fast_inter = (inter is not None and inter["hf"][0] is not None
                          and not fs.pcm_blocks)

        # ---- ONE coalesced upload for the whole frame ---------------------
        # (the tunneled runtime charges ~8 ms fixed per device_put once
        # any D2H has happened; see upload_group)
        group = [arena4, arena16, escs, meta,
                 np.full((1, 1), n, np.int32)]
        gi = {"bounds": None, "ccp": None, "md": None, "wt": None,
              "fargs": None}
        if bounds is not None:
            gi["bounds"] = len(group)
            group.append(bounds)
        if smap is not None:
            gi["ccp"] = len(group)
            group.append(smap)
        if fast_inter:
            md = inter["md"]
            gi["md"] = len(group)
            group.append(md["idx"])
            group.append(md["vals"])
            wt = inter.get("wt")
            if wt is not None:
                gi["wt"] = len(group)
                group.append(wt["wg"])
                group.append(wt["og"])
        if fargs_np is not None:
            gi["fargs"] = len(group)
            group.extend(fargs_np)
        dev = upload_group(group, wire=self.wire)
        arena4_d, arena16_d, escs_d, meta_d, nn_d = dev[:5]
        bounds_d = dev[gi["bounds"]] if gi["bounds"] is not None else None
        ccp_dev = dev[gi["ccp"]] if gi["ccp"] is not None else None
        fargs = tuple(dev[gi["fargs"]:gi["fargs"] + len(fargs_np)]) \
            if gi["fargs"] is not None else None

        # ---- base planes (PCM prefill; inter prediction if present) -------
        prefill = True
        if fast_inter:
            # all-device prefill: residual from the shared arena +
            # two-stage MC over the device-resident DPB stacks; no
            # frame-sized host upload for inter frames. Kept as a
            # SEPARATE dispatch from _frame_fused: merging the MC
            # gather into the same XLA program as the Pallas banded
            # kernel measured ~12x slower on device (XLA scheduling
            # pathology), vs ~166ms+81ms split.
            md = inter["md"]
            wt = inter.get("wt")
            wt_dev = None
            denoms = None
            if wt is not None:
                wt_dev = (dev[gi["wt"]], dev[gi["wt"] + 1])
                denoms = tuple(wt["denoms"])
            luma, chroma = _inter_prefill(
                arena4_d, arena16_d, escs_d,
                dev[gi["md"]], dev[gi["md"] + 1],
                inter["hf"][0], inter["hf"][1], inter["hf"][2],
                wt=wt_dev, ccp=ccp_dev, caps=caps, H=H, W=W,
                Hc=Hc, Wc=Wc, hl=hl, wl=wl, hc=hc, wc=wc, bd=bd,
                hs=hs, vs=vs, h4=md["h4"], w4=md["w4"],
                denoms=denoms,
                pairs=inter.get("pairs", False))
            self._dbg("inter_prefill", (luma, chroma))
        elif fs.inter_pbs:
            # PCM+inter mix or no usable reference: legacy packed path
            pf = pack_frame(fs)
            pf.inter = inter
            pf.ccp = smap
            planes4 = self._run_inter_only(pf)   # [4, H, W] post-inter
            self.wire.h2d(pf.planes0.nbytes)
            luma = _embed_luma(planes4, hl, wl, H, W)
            chroma = _embed_chroma(planes4, hc, wc, Hc, Wc)
        elif fs.pcm_blocks:
            p0 = np.zeros((hl, wl), np.int32)
            c0 = np.zeros((2, hc, wc), np.int32)
            for p in fs.pcm_blocks:
                s_ = p.size
                p0[OY + p.y:OY + p.y + s_, OX + p.x:OX + p.x + s_] = \
                    p.samples_y
                cy, cx = p.y >> vs, p.x >> hs
                ch_, cw_ = s_ >> vs, s_ >> hs
                c0[0, OY + cy:OY + cy + ch_, OX + cx:OX + cx + cw_] = \
                    p.samples_cb
                c0[1, OY + cy:OY + cy + ch_, OX + cx:OX + cx + cw_] = \
                    p.samples_cr
            luma, chroma = upload_group([p0, c0], wire=self.wire)
        else:
            prefill = False
            luma = chroma = None

        # ---- single dispatch: residual + fused intra + crop ---------------
        flat = _frame_fused(arena4_d, arena16_d, escs_d, meta_d,
                            nn_d,
                            luma, chroma, fargs,
                            bounds_d,
                            ccp_dev,
                            caps=caps, hl=hl, wl=wl,
                            hc=hc, wc=wc, H=H, W=W, Hc=Hc, Wc=Wc, bd=bd,
                            npad=npad, prefill=prefill, filters=fmask,
                            cs=1 << sps.log2_ctb,
                            bdc=sps.bit_depth_chroma,
                            sdis=bool(getattr(sps, "intra_smoothing_disabled",
                                              0)),
                            c444=sps.chroma_format_idc == 3,
                            strong=bool(sps.strong_intra_smoothing),
                            banded=banded)
        self._dbg("frame_fused", flat)
        # >8-bit outputs cross the wire bit-packed (10-bit: 1.25 B/sample
        # vs the uint16 2.0) — on the shared host<->device link the D2H
        # of a 4K Main10 frame is ~25 MB and THE fps ceiling; the packed
        # form is a separate device array so `flat` stays the
        # device-resident DPB entry. OPENHEVC_PACK_OUTPUT=0 disables
        # (PCIe hosts where the unpack CPU cost outweighs wire savings).
        packed = _maybe_pack_out(flat, bd, self.pack_output)
        wire_form = _wire_norm(flat if packed is None else packed)
        if self.fetch_outputs:
            lp = LazyPlanes(flat, H, W, Hc, Wc, pool=self._fetch_pool,
                            wire=self.wire, packed=packed, bd=bd,
                            wire_form=wire_form)
            self._fetch_pool.add(lp)
        else:
            # SHVC base layer: outputs are never displayed — planes stay
            # device-resident (IL upsample + MC read them there); a host
            # materialization only happens on an explicit get()
            lp = LazyPlanes(flat, H, W, Hc, Wc, pool=None,
                            wire=self.wire, packed=packed, bd=bd,
                            wire_form=wire_form)
        lp.device_filtered = fmask != 0
        return lp

    def _run_inter_only(self, pf: PackedFrame):
        """The existing [4,H,W] pipeline through residual+inter, skipping
        the intra stage (the fused kernel handles it)."""
        pf2 = PackedFrame(width=pf.width, height=pf.height,
                          bit_depth=pf.bit_depth,
                          strong_smoothing=pf.strong_smoothing,
                          planes0=pf.planes0, res=pf.res,
                          intra={}, n_levels=0, inter=pf.inter,
                          hshift=pf.hshift, vshift=pf.vshift,
                          ccp=pf.ccp)
        return self._run(pf2)

    def _pack_inter(self, fs: FrameSymbols, ref_planes):
        """Dense MC fields from the motion grids + stacked reference
        planes (device MC, ops/mc.py)."""
        mc = fs.motion
        sps = fs.sps
        pocs = sorted({p for p in
                       set(fs.ref_poc_l0) | set(fs.ref_poc_l1)
                       if p in ref_planes})
        h4, w4 = mc.pred_flag.shape
        pf4 = np.asarray(mc.pred_flag, np.uint8)
        # poc -> pool slot via one searchsorted per list (pocs sorted);
        # unknown pocs map to 0, matching the prior per-poc loop
        # (robustness: lists whose picture is unavailable)
        slot = np.zeros((2, h4, w4), np.uint8)
        if pocs:
            keys = np.asarray(pocs)
            for lx in range(2):
                pocg = np.asarray(mc.refpoc[:, :, lx])
                idx = np.clip(np.searchsorted(keys, pocg), 0,
                              len(keys) - 1)
                slot[lx] = np.where(keys[idx] == pocg, idx,
                                    0).astype(np.uint8)
        mv = np.asarray(mc.mv, np.int16)          # [h4,w4,2,2] (qpel MVs
        # are spec-bounded to +-2^15, hevc.h Mv int16 — exact in int16)
        bd = sps.bit_depth
        # all-phase-pair prefilter where the per-ref memory is sane
        # (<= ~1080p); 4K stays on the 8x-leaner tap path
        pairs = sps.height * sps.width <= self.MC_PAIRS_MAX_PIXELS
        hf = {c: self._hf_stack(pocs, ref_planes, c, bd, pairs=pairs)
              for c in range(3)}
        out = dict(pf4=pf4, mv=mv, slot=slot, hf=hf, pairs=pairs)
        out["md"] = motion_diff2(pf4, slot, mv)
        wt = weight_grids(fs)
        if wt is not None:
            out["wt"] = wt
        return out

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
            sm = b.get("sm")
            r = residual_bucket(jnp.asarray(b["levels"]),
                                jnp.asarray(b["qp"]),
                                jnp.asarray(fl[:, 0]), jnp.asarray(fl[:, 1]),
                                jnp.asarray(fl[:, 2]), jnp.asarray(fl[:, 3]),
                                jnp.asarray(fl[:, 4]), s=s, bit_depth=bd,
                                sm=None if sm is None else jnp.asarray(sm))
            res_planes = scatter_blocks(res_planes, r,
                                        jnp.asarray(b["plane"]),
                                        jnp.asarray(b["bx"]),
                                        jnp.asarray(b["by"]), s=s)
        if getattr(pf, "ccp", None) is not None:
            # RExt cross-component prediction (hevc.c:1295-1362)
            Hc_ = pf.height >> pf.vshift
            Wc_ = pf.width >> pf.hshift
            smap = jnp.asarray(pf.ccp).astype(jnp.int32)
            rl = res_planes[0, :Hc_, :Wc_]
            rc = res_planes[1:3, :Hc_, :Wc_]
            tot = rc + ((smap * rl[None]) >> 3)
            wrapped = ((tot + (1 << 15)) & 0xFFFF) - (1 << 15)
            out = jnp.where(smap != 0, wrapped, rc)
            res_planes = res_planes.at[1:3, :Hc_, :Wc_].set(out)
        # inter prediction (two-stage dense device MC) before the intra
        # scan: stage-1 hf stacks were prefiltered/cached per reference
        # picture; stage 2 + combine here, all grid upsampling on device
        inter = getattr(pf, "inter", None)
        if inter is not None and inter["hf"][0] is not None:
            from ..ops.mc import (mc_put, mc_put_pairs,
                                  inter_combine, inter_combine_w)
            H, W = pf.height, pf.width
            pf4 = jnp.asarray(inter["pf4"])
            mv_dev = jnp.asarray(inter["mv"])       # [h4,w4,2,2]
            slot_dev = jnp.asarray(inter["slot"])   # [2,h4,w4]
            for c in range(3):
                is_luma = c == 0
                sh = 0 if is_luma else pf.hshift
                sv = 0 if is_luma else pf.vshift
                ph, pw = H >> sv, W >> sh
                reph, repv = 4 >> sh, 4 >> sv
                putf = mc_put_pairs if inter.get("pairs") else mc_put
                puts = [putf(inter["hf"][c], mv_dev[:, :, lx],
                             slot_dev[lx], bit_depth=bd,
                             is_luma=is_luma, hs=pf.hshift,
                             vs=pf.vshift, H=ph, W=pw)
                        for lx in range(2)]
                wt = inter.get("wt")
                if wt is not None:
                    denom = wt["denoms"][0 if is_luma else 1]
                    planes = inter_combine_w(
                        planes, res_planes, puts[0], puts[1], pf4,
                        jnp.asarray(wt["wg"][0, c]),
                        jnp.asarray(wt["og"][0, c]),
                        jnp.asarray(wt["wg"][1, c]),
                        jnp.asarray(wt["og"][1, c]),
                        c, bit_depth=bd, denom=denom,
                        reph=reph, repv=repv)
                else:
                    planes = inter_combine(planes, res_planes,
                                           puts[0], puts[1],
                                           pf4, c, bit_depth=bd,
                                           reph=reph, repv=repv)
        # intra wavefront
        if pf.n_levels and isinstance(pf.intra, dict) and \
                "stacked" in pf.intra:
            # host-driven level loop over donated plane buffers; job data
            # lives in a few stacked device arrays indexed per level
            from ..ops.intra import predict_batch_level
            stacked = jax.device_put(pf.intra["stacked"])
            counters = {k: jnp.int32(0) for k in stacked}
            for steps in pf.intra["order"]:
                for (key, _gi, s) in steps:
                    planes, counters[key] = predict_batch_level(
                        planes, res_planes, stacked[key], counters[key],
                        s=s, bit_depth=bd,
                        strong_smoothing=pf.strong_smoothing)
        elif pf.n_levels:
            sizes = tuple(s for s in SIZES if pf.intra[s] is not None)
            xs = {s: {k: jnp.asarray(v) for k, v in pf.intra[s].items()}
                  for s in sizes}
            planes = _intra_scan(planes, res_planes, xs, sizes, bd,
                                 pf.strong_smoothing)
        return planes


# far-negative coord sentinel for padded scatter rows; must survive the
# int16 arena round trip (mode='drop' discards any negative index)
FAR = -(1 << 14)


class FetchPool:
    """Background, batched device->host output transfer.

    The tunneled TPU runtime charges a flat ~23 ms completion-notification
    window for EVERY blocking fetch (on top of ~40 MB/s wire), so frames
    are fetched by a daemon thread — the wire transfer releases the GIL,
    overlapping the next frames' host-side parse — and all frames pending
    at drain time are stacked into ONE device array so a burst pays one
    notification window."""

    def __init__(self):
        import threading
        self._cv = threading.Condition()
        self._queue: list[LazyPlanes] = []
        self._thread = None
        self._threading = threading
        import time as _time
        self._time = _time
        self._stopped = False
        self._urgent = False

    # Every fetch burst pays a flat ~45 ms completion window on the
    # tunneled runtime (plus wire), so group frames: wait for MIN_BATCH
    # frames or BATCH_WAIT_S after the first, unless a consumer is
    # already blocking on one of the queued frames (urgent()).
    import os as _os
    MIN_BATCH = int(_os.environ.get("OPENHEVC_FETCH_BATCH", "8"))
    BATCH_WAIT_S = float(_os.environ.get("OPENHEVC_FETCH_WAIT", "0.12"))

    def add(self, lp):
        with self._cv:
            if self._thread is None:
                import atexit
                self._thread = self._threading.Thread(
                    target=self._loop, daemon=True)
                self._thread.start()
                atexit.register(self._shutdown)
            self._queue.append(lp)
            self._cv.notify()

    def urgent(self, lp):
        """A consumer blocks on lp: fetch the pending batch now."""
        with self._cv:
            if lp in self._queue:
                self._urgent = True
                self._cv.notify()

    _urgent = False

    def _loop(self):
        while not self._stopped:
            with self._cv:
                while not self._queue and not self._stopped:
                    self._cv.wait()
                deadline = self._time.monotonic() + self.BATCH_WAIT_S
                while (len(self._queue) < self.MIN_BATCH
                       and not self._urgent and not self._stopped):
                    left = deadline - self._time.monotonic()
                    if left <= 0:
                        break
                    self._cv.wait(left)
                batch = self._queue
                self._queue = []
                self._urgent = False
            self._fetch(batch)

    def _shutdown(self):
        # drain before interpreter teardown: a daemon thread killed while
        # inside the runtime's D2H path aborts the process ("terminate
        # called ... exception not rethrown")
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        t = self._thread
        if t is not None and t.is_alive():
            t.join(timeout=30)

    @staticmethod
    def _fetch(ps):
        # Issue async D2H copies for the whole burst first: the runtime
        # overlaps the per-fetch completion windows, so a burst of k
        # frames pays ~one window + wire, with no stacking compile.
        for p in ps:
            try:
                p._wire_arr.copy_to_host_async()
            except BaseException:
                pass                       # surfaced by np.asarray below
        for p in ps:
            try:
                p._set_host(np.asarray(p._wire_arr))
            except BaseException as e:     # propagate into consumers
                p._fail(e)


@jax.jit
def _wire_norm(a):
    """Identity copy through its own tiny program. _frame_fused's fused
    output keeps whatever layout XLA chose for the big program — which
    the tunneled runtime fetches at ~2 MB/s (padded/tiled layout,
    element-granular readback). The standalone copy gets the compact
    default layout and fetches at the link's full ~35 MB/s. Applied to
    the WIRE form only; the original array stays as the device-resident
    DPB entry."""
    return a + jnp.zeros((), a.dtype)


@partial(jax.jit, static_argnames=("k",))
def _pack_bits_dev(flat, k):
    """uint16 samples -> tight wire form: low-8-bit plane followed by
    the high (bd-8 = k) bits packed 8//k per byte. 10-bit output drops
    from 2.0 to 1.25 B/sample on the D2H wire."""
    per = 8 // k
    n = flat.shape[0]
    pad = (-n) % per
    x = flat.astype(jnp.uint16)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), jnp.uint16)])
    lo = (x & 0xFF).astype(jnp.uint8)
    hi = (x >> 8).astype(jnp.uint8).reshape(-1, per)
    acc = hi[:, 0]
    for j in range(1, per):
        acc = acc | (hi[:, j] << (k * j))
    return jnp.concatenate([lo, acc])


def _maybe_pack_out(flat, bd, enabled=None):
    """Device bit-packed wire form of a >8-bit flat output, or None
    when packing is off / not applicable. enabled: DecoderConfig
    override (None = OPENHEVC_PACK_OUTPUT env, default on)."""
    k = bd - 8
    if k not in (1, 2, 4) or flat.dtype != jnp.uint16:
        return None
    if enabled is None:
        enabled = os.environ.get("OPENHEVC_PACK_OUTPUT", "1") == "1"
    if not enabled:
        return None
    return _pack_bits_dev(flat, k)


def _unpack_out(buf, n, bd):
    """Host-side inverse of _pack_bits_dev -> uint16 [n]."""
    k = bd - 8
    per = 8 // k
    npad = n + ((-n) % per)
    lo, hib = buf[:npad], buf[npad:]
    x = lo.astype(np.uint16)
    hi = np.empty(npad, np.uint8)
    for j in range(per):
        hi[j::per] = (hib >> (k * j)) & ((1 << k) - 1)
    x |= hi.astype(np.uint16) << 8
    return x[:n]


class DevicePlanes:
    """[Y, Cb, Cr] kept as three device arrays (the SHVC inter-layer
    reference, ops/upsample.upsample_il_frame_dev). Quacks like the
    host plane list; host materialization is lazy and cached."""

    def __init__(self, planes_dev):
        self._planes_dev = planes_dev
        self._mat = None

    def get(self):
        if self._mat is None:
            self._mat = [np.asarray(p).astype(np.int32)
                         for p in self._planes_dev]
        return self._mat

    def __getitem__(self, i):
        return self.get()[i]

    def __iter__(self):
        return iter(self.get())

    def __len__(self):
        return 3


class LazyPlanes:
    """Deferred device->host frame fetch (see FetchPool). Quacks like the
    [Y, Cb, Cr] list the rest of the decoder expects."""

    device_filtered = False

    def __init__(self, flat, H, W, Hc, Wc, pool: FetchPool | None = None,
                 wire: WireStats | None = None, packed=None, bd=8,
                 wire_form=None):
        import threading
        self._flat = flat
        # the flat device output stays referenced while this picture
        # lives: it IS the device-resident DPB entry (hevc_refs.c DPB
        # planes), read back by later frames' MC with zero wire bytes
        self._dev = flat
        # optional bit-packed wire form of the same samples (>8-bit
        # streams): fetched instead of `flat`, unpacked host-side
        self._packed = packed
        # layout-normalized copy that actually crosses the wire
        # (_wire_norm: the fused program's own output layout fetches
        # ~20x slower through the tunnel)
        self._wire_form = wire_form
        self._bd = bd
        self._dims = (H, W, Hc, Wc)
        self._mat = None
        self._exc = None
        self._done = threading.Event()
        self._pool = pool
        self._wire = wire

    @property
    def _wire_arr(self):
        """The device array that crosses the wire at fetch time."""
        if self._wire_form is not None:
            return self._wire_form
        return self._flat if self._packed is None else self._packed

    def _set_host(self, host):
        H, W, Hc, Wc = self._dims
        if self._wire is not None:
            self._wire.d2h(host.nbytes)
        if self._packed is not None:
            host = _unpack_out(host, H * W + 2 * Hc * Wc, self._bd)
            self._packed = None
        self._wire_form = None
        # keep the wire dtype (uint8/uint16): the splits are views, so
        # materialization costs zero host copies — every consumer
        # (filters, MC upload, hashing) widens for itself
        self._mat = [host[:H * W].reshape(H, W),
                     host[H * W:H * W + Hc * Wc].reshape(Hc, Wc),
                     host[H * W + Hc * Wc:].reshape(Hc, Wc)]
        self._flat = None
        self._done.set()

    def _fail(self, exc):
        self._exc = exc
        self._done.set()

    def get(self):
        if self._mat is None:
            if self._pool is not None:
                self._pool.urgent(self)
                self._done.wait()
            else:
                self._set_host(np.asarray(self._wire_arr))
            if self._exc is not None:
                raise self._exc
        return self._mat

    def __getitem__(self, i):
        return self.get()[i]

    def __iter__(self):
        return iter(self.get())

    def __len__(self):
        return 3


def _pack_arena(buckets):
    """Pack every residual-bucket field across sizes into two uploads on
    the ~55 MB/s SHARED up+down host<->device link — the wire is the
    decode bottleneck, so per TU only the SCAN-ORDER PREFIX up to the
    last significant coefficient ships (ops/coeff_scan.py; the same
    locality hevc_cabac.c:1372's last_sig syntax exploits), in one of
    two per-TU formats chosen by byte cost: 4-bit biased nibbles
    (|level| <= 7, rest via escapes) or 8-bit biased bytes (dense/
    high-energy TUs — kills their escape storm). Escapes are int32
    (bucket-local raster index, delta) pairs applied on device with a
    scatter-add. Sideband: 4 int16 per block (x, y,
    qp<<7|flags<<2|plane, prefix_len|mode<<12), plus scaling matrices
    when present.

    Returns (arena4, arena16, esc, caps) with caps =
    ((s, cap, has_sm, n_esc), ...) — the static layout key. arena4 is
    the variable-length payload arena, tail-padded to a geometric byte
    bucket (its LENGTH is the extra static-layout component)."""
    from ..ops.coeff_scan import SCAN
    pay, p16, pesc = [], [], []
    caps = []
    for s in SIZES:
        b = buckets.get(s)
        if b is None or len(b["qp"]) == 0:
            caps.append((s, 0, 0, 0))
            continue
        cap = len(b["qp"])
        sm = b.get("sm")
        ss = s * s
        scan = SCAN[s]
        lvs = b["levels"].reshape(cap, ss)[:, scan]   # scan domain
        nz = lvs != 0
        cnt = np.where(nz.any(1), ss - np.argmax(nz[:, ::-1], 1),
                       0).astype(np.int32)            # last sig + 1
        k = np.arange(ss, dtype=np.int32)[None, :]
        inpfx = k < cnt[:, None]
        esc_nib = ((lvs != np.clip(lvs, -8, 7)) & inpfx).sum(1)
        esc_byt = ((lvs != np.clip(lvs, -128, 127)) & inpfx).sum(1)
        byte_mode = (cnt + 8 * esc_byt) < ((cnt + 1) // 2 + 8 * esc_nib)
        pay_len = np.where(byte_mode, cnt, (cnt + 1) // 2)
        # payload byte matrix [cap, ss]; row j's first pay_len[j] bytes
        # are TU j's payload
        B = np.zeros((cap, ss), np.uint8)
        c4 = (np.clip(lvs, -8, 7) + 8).astype(np.uint8)
        nibB = c4[:, 0::2] | (c4[:, 1::2] << 4)
        c8 = (np.clip(lvs, -128, 127) + 128).astype(np.uint8)
        B[byte_mode] = c8[byte_mode]
        B[~byte_mode, :ss // 2] = nibB[~byte_mode]
        pay.append(B[k < pay_len[:, None]])   # row-major: per-TU concat
        # escapes: delta vs the stored (clipped) value, raster positions
        stored = np.where(byte_mode[:, None], np.clip(lvs, -128, 127),
                          np.clip(lvs, -8, 7))
        diff = np.where(inpfx, lvs - stored, 0)
        er, ec = np.nonzero(diff)
        n_pairs = len(er)
        n_esc = 0
        if n_pairs:
            n_esc = 8 if n_pairs <= 8 else _round_fine(n_pairs, 64)
            e = np.full((n_esc, 2), -1, np.int32)
            e[:n_pairs, 0] = er * ss + scan[ec]
            e[:n_pairs, 1] = diff[er, ec]
            pesc.append(e.reshape(-1))
        caps.append((s, cap, 0 if sm is None else 1, n_esc))
        fl = b["flags"].astype(np.int32)
        qpf = (b["qp"].astype(np.int32) << 7) | \
            (fl[:, 0] << 2) | (fl[:, 1] << 3) | (fl[:, 2] << 4) | \
            (fl[:, 3] << 5) | (fl[:, 4] << 6) | b["plane"]
        cw = (cnt | (byte_mode.astype(np.int32) << 12)).astype(np.int16)
        p16 += [b["x"].astype(np.int16),
                b["y"].astype(np.int16),
                qpf.astype(np.int16), cw]
        if sm is not None:
            p16.append(sm.reshape(-1).astype(np.int16))
    total = sum(x.size for x in pay)
    arena4 = np.zeros(_round_fine(max(total, 1), 4096), np.uint8)
    if total:
        arena4[:total] = np.concatenate(pay)
    arena16 = np.concatenate(p16) if p16 else np.zeros(1, np.int16)
    esc = np.concatenate(pesc) if pesc else np.zeros(2, np.int32)
    return arena4, arena16, esc, tuple(caps)


def _acc_add(a, b):
    """Sum two [>=H, >=W] per-size residual maps of differing pad dims."""
    h, w = max(a.shape[0], b.shape[0]), max(a.shape[1], b.shape[1])
    if a.shape != (h, w):
        a = jnp.pad(a, ((0, h - a.shape[0]), (0, w - a.shape[1])))
    if b.shape != (h, w):
        b = jnp.pad(b, ((0, h - b.shape[0]), (0, w - b.shape[1])))
    return a + b


def _acc_add2(a, b):
    h, w = max(a.shape[1], b.shape[1]), max(a.shape[2], b.shape[2])
    if a.shape[1:] != (h, w):
        a = jnp.pad(a, ((0, 0), (0, h - a.shape[1]), (0, w - a.shape[2])))
    if b.shape[1:] != (h, w):
        b = jnp.pad(b, ((0, 0), (0, h - b.shape[1]), (0, w - b.shape[2])))
    return a + b


def _unpack_nibbles(arena4):
    """Biased-nibble level arena (uint8, two levels per byte; low nibble =
    even index) -> flat int32 levels. (v1 helper, kept for the mesh
    path's tests/tools; the frame path uses the v2 scan-prefix unpack
    inside _residual_acc.)"""
    nib = arena4.astype(jnp.int32)
    return jnp.stack([(nib & 15) - 8, (nib >> 4) - 8], axis=1).reshape(-1)


def _derive_meta16(meta8, sdis, c444, strong):
    """Rebuild the intra kernel's [16, npad] meta from the 5 uploaded
    rows (ops/intra_fused.py pack_meta layout: y, x,
    sl|plane<<2|mode<<4|av_hi<<10, av_w0, av_w1) — the do-filter/angle/
    edge rows are pure functions of mode/size/plane, derived on device
    to cut the upload to 10 B/job on the shared host<->device wire."""
    from ..ops.intra_fused import _ANG, _INV
    m8 = meta8.astype(jnp.int32)
    my, mx, mpk, mav0, mav1 = (m8[i] for i in range(5))
    msl = mpk & 3
    mplane = (mpk >> 2) & 3
    mmode = (mpk >> 4) & 63
    mavhi = (mpk >> 10) & 1
    ms = 4 << msl                                    # TB size
    md = jnp.minimum(jnp.abs(mmode - 26), jnp.abs(mmode - 10))
    thr = jnp.select([ms == 8, ms == 16, ms == 32],
                     [jnp.full_like(ms, 7), jnp.full_like(ms, 1),
                      jnp.zeros_like(ms)], jnp.full_like(ms, 99))
    filt_ok = ((mplane == 0) | bool(c444)) & (not sdis)
    m5 = (filt_ok & (ms > 4) & (mmode != 1) & (md > thr)).astype(jnp.int32)
    mang = jnp.take(jnp.asarray(_ANG, jnp.int32), mmode, mode="clip")
    minv = jnp.take(jnp.asarray(_INV, jnp.int32), mmode, mode="clip")
    m10 = ((ms == 32) & bool(strong) & (mplane == 0)).astype(jnp.int32)
    m11 = ((mav0 != 0) | (mav1 != 0) | (mavhi != 0)).astype(jnp.int32)
    m12 = ((ms < 32) & (mplane == 0)).astype(jnp.int32)
    z = jnp.zeros_like(my)
    return jnp.stack([my, mx, msl, mmode, mplane, m5, mav0, mav1,
                      mang, minv, m10, m11, m12, mavhi, z, z])


def ccp_scale_map(fs):
    """RExt cross-component prediction: per-pixel res_scale_val map
    [2, Hc, Wc] int8 over the chroma planes (0 where CCP is off for a
    TU), built from the parsed blocks. None when the PPS flag is off or
    nothing uses it. 4:4:4 only (the only chroma format CCP allows)."""
    if not getattr(fs.pps, "cross_component_prediction_enabled", 0):
        return None
    fs.ensure_objects()
    sps = fs.sps
    Hc, Wc = sps.height >> sps.vshift1, sps.width >> sps.hshift1
    smap = np.zeros((2, Hc, Wc), np.int8)
    any_ = False
    for cb in fs.coeff_blocks:
        if cb.plane and cb.cross_scale:
            s = 1 << cb.log2_size
            smap[cb.plane - 1, cb.y:cb.y + s, cb.x:cb.x + s] = \
                cb.cross_scale
            any_ = True
    return smap if any_ else None


def _apply_ccp(acc_l, acc_c, smap, Hc, Wc):
    """Couple the chroma residual to the co-located luma residual:
    r_c += (res_scale_val * r_l) >> 3, accumulated with the reference's
    int16 coeffs-buffer wraparound (hevc.c:1295-1362). acc_l/acc_c are
    the (possibly over-sized) whole-plane residual maps."""
    rl = acc_l[:Hc, :Wc]
    rc = acc_c[:, :Hc, :Wc]
    s32 = smap.astype(jnp.int32)
    tot = rc + ((s32 * rl[None]) >> 3)
    wrapped = ((tot + (1 << 15)) & 0xFFFF) - (1 << 15)
    out = jnp.where(s32 != 0, wrapped, rc)
    return acc_c.at[:, :Hc, :Wc].set(out)


def _arena_levels(arena4, arena16, escs, caps):
    """Device-side rebuild of per-bucket raster levels from the v2
    scan-prefix wire format (see _pack_arena): yields
    (s, cap, has_sm, n_esc, x, y, qpf, sm, levels [cap, s, s]) per
    non-empty bucket. Per-TU payload offsets come from ONE cumsum over
    the sideband's prefix-length row; each bucket is one [cap, s*s]
    byte gather + nibble/byte select + static inverse-scan permute +
    escape scatter-add."""
    from ..ops.coeff_scan import INV_SCAN
    # jnp arrays throughout: the payload gather relies on JAX's clamped
    # out-of-bounds semantics (offsets past the last TU's payload)
    pay = jnp.asarray(arena4).astype(jnp.int32)
    a = jnp.asarray(arena16).astype(jnp.int32)
    esc = jnp.asarray(escs).reshape(-1, 2)
    # pass 1: static sideband walk; global exclusive-cumsum payload offsets
    segs = []
    off = 0
    for s, cap, has_sm, n_esc in caps:
        if cap == 0:
            segs.append(None)
            continue
        x = a[off:off + cap]
        off += cap
        y = a[off:off + cap]
        off += cap
        qpf = a[off:off + cap]
        off += cap
        cw = a[off:off + cap]
        off += cap
        sm = None
        if has_sm:
            sm = a[off:off + cap * s * s].reshape(cap, s, s)
            off += cap * s * s
        cnt = cw & 0xFFF
        mode = (cw >> 12) & 1
        segs.append((x, y, qpf, cnt, mode, sm))
    lens = [jnp.where(seg[4] == 1, seg[3], (seg[3] + 1) >> 1)
            for seg in segs if seg is not None]
    if not lens:
        return
    all_len = jnp.concatenate(lens)
    all_off = jnp.cumsum(all_len) - all_len      # exclusive
    eoff = boff = 0
    for (s, cap, has_sm, n_esc), seg in zip(caps, segs):
        if cap == 0:
            continue
        x, y, qpf, cnt, mode, sm = seg
        offs = all_off[boff:boff + cap]
        boff += cap
        ss = s * s
        k = jnp.arange(ss, dtype=jnp.int32)[None, :]
        bidx = offs[:, None] + jnp.where(mode[:, None] == 1, k, k >> 1)
        raw = pay[bidx]                      # jit gather: clamped idx
        nib = jnp.where((k & 1) == 1, raw >> 4, raw & 15) - 8
        lvs = jnp.where(mode[:, None] == 1, raw - 128, nib)
        lvs = jnp.where(k < cnt[:, None], lvs, 0)   # beyond prefix: 0
        lvf = lvs[:, INV_SCAN[s]].reshape(-1)       # scan -> raster
        if n_esc:
            e = esc[eoff:eoff + n_esc]
            eoff += n_esc
            # padding pairs are (-1, -1): map negative to out-of-range
            # so mode="drop" really drops them (negative indices WRAP
            # in jnp indexed updates — they'd corrupt the last level)
            eidx = jnp.where(e[:, 0] < 0, jnp.int32(1 << 30), e[:, 0])
            lvf = lvf.at[eidx].add(e[:, 1], mode="drop")
        yield (s, cap, has_sm, n_esc, x, y, qpf, sm,
               lvf.reshape(cap, s, s))


def _residual_acc(arena4, arena16, escs, *, caps, H, W, Hc, Wc, bd):
    """Dequant+IDCT every residual bucket of the scan-prefix payload
    arena (see _pack_arena's v2 format) and accumulate into whole-plane
    maps: (acc_l [>=H, >=W] | None, acc_c [2, >=Hc, >=Wc] | None).
    Per-TU payload offsets come from ONE device cumsum over the
    sideband's prefix-length row; the per-bucket level rebuild is a
    single [cap, s*s] byte gather + nibble/byte select + static
    inverse-scan permute. Slot-granular scatter: TUs of size s are
    s-aligned in their plane, so each lands in exactly one cell of a
    [Hg*Wg, s, s] grid — XLA lowers the slot scatter with
    whole-(s,s)-window updates instead of per-element index arithmetic
    (was ~6 ms/frame, now <1)."""
    acc_l = None         # [>=H, >=W] luma residual, accumulated per size
    acc_c = None         # [2, >=Hc, >=Wc]
    for (s, cap, has_sm, n_esc, x, y, qpf, sm, lv) in \
            _arena_levels(arena4, arena16, escs, caps):
        plane = qpf & 3
        qp = qpf >> 7
        r = residual_bucket(lv, qp, (qpf >> 2) & 1 != 0, (qpf >> 3) & 1 != 0,
                            (qpf >> 4) & 1 != 0, (qpf >> 5) & 1 != 0,
                            (qpf >> 6) & 1 != 0, s=s, bit_depth=bd, sm=sm)
        hg, wg = -(-H // s), -(-W // s)
        slot_l = jnp.where(plane == 0, (y // s) * wg + x // s,
                           1 << 30)   # out of range => dropped (NOT -1:
                                      # negative in-range indices wrap)
        gl = jnp.zeros((hg * wg, s, s), jnp.int32) \
            .at[slot_l].add(r, mode="drop") \
            .reshape(hg, wg, s, s).transpose(0, 2, 1, 3) \
            .reshape(hg * s, wg * s)
        acc_l = gl if acc_l is None else _acc_add(acc_l, gl)
        hgc, wgc = -(-Hc // s), -(-Wc // s)
        slot_c = jnp.where((plane > 0) & (plane < 3),
                           (plane - 1) * hgc * wgc +
                           (y // s) * wgc + x // s, 1 << 30)
        gc = jnp.zeros((2 * hgc * wgc, s, s), jnp.int32) \
            .at[slot_c].add(r, mode="drop") \
            .reshape(2, hgc, wgc, s, s).transpose(0, 1, 3, 2, 4) \
            .reshape(2, hgc * s, wgc * s)
        acc_c = gc if acc_c is None else _acc_add2(acc_c, gc)
    return acc_l, acc_c


@partial(jax.jit, static_argnames=("caps", "H", "W", "Hc", "Wc",
                                   "hl", "wl", "hc", "wc", "bd",
                                   "hs", "vs", "denoms", "pairs",
                                   "h4", "w4"))
def _inter_prefill(arena4, arena16, escs, midx, mvals, hf0, hf1, hf2,
                   wt=None, ccp=None, *, caps, H, W, Hc, Wc, hl, wl, hc,
                   wc, bd, hs, vs, h4, w4, denoms=None, pairs=False):
    """Device-side inter-prediction prefill for the fused frame path:
    residual assembly from the (shared) nibble arena + two-stage MC from
    the DEVICE-RESIDENT stage-1 stacks + uni/bi (weighted) combine.
    Returns (luma [hl, wl], chroma [2, hc, wc]) int32 padded buffers
    ready to hand to _frame_fused as its prefill — intra pixels are 0.
    Nothing frame-sized crosses the host wire: uploads are the arenas,
    the sparse PU-corner motion deltas (motion_diff2 — the dense
    [h4, w4] grids rebuild here via cumsum) and (when weighted) the
    weight grids.

    Parity: luma_mc_uni/bi + chroma_mc_uni/bi (hevc.c:1641-1949) with
    put_hevc_qpel/epel + weighted combine (hevcdsp_template.c)."""
    acc_l, acc_c = _residual_acc(arena4, arena16, escs, caps=caps,
                                 H=H, W=W, Hc=Hc, Wc=Wc, bd=bd)
    if ccp is not None and acc_l is not None:
        acc_c = _apply_ccp(acc_l, acc_c, ccp, Hc, Wc)
    pf4, mv, slot = _motion_grids_dev(midx, mvals, h4, w4)
    return _prefill_from_acc(acc_l, acc_c, pf4, mv, slot,
                             (hf0, hf1, hf2), wt, H=H, W=W, Hc=Hc,
                             Wc=Wc, hl=hl, wl=wl, hc=hc, wc=wc, bd=bd,
                             hs=hs, vs=vs, denoms=denoms, pairs=pairs)


def _prefill_from_acc(acc_l, acc_c, pf4, mv, slot, hfs, wt, *, H, W,
                      Hc, Wc, hl, wl, hc, wc, bd, hs, vs, denoms,
                      pairs):
    """Two-stage MC + (weighted) uni/bi combine + residual add over
    already-assembled residual maps; returns embedded prefill buffers.
    Shared by _inter_prefill and _frame_fused (single-dispatch inter
    frames)."""
    from ..ops.mc import (mc_put_core, mc_put_pairs_core, combine_plane,
                          combine_plane_w)
    from ..ops.intra_fused import OY, OX
    pf4 = pf4.astype(jnp.int32)
    outs = []
    for c in range(3):
        is_luma = c == 0
        ph = H if is_luma else Hc
        pw = W if is_luma else Wc
        reph = 4 if is_luma else 4 >> hs
        repv = 4 if is_luma else 4 >> vs
        hf = hfs[c]
        put_fn = mc_put_pairs_core if pairs else mc_put_core
        puts = [put_fn(hf, mv[:, :, lx], slot[lx], bit_depth=bd,
                       is_luma=is_luma, hs=hs, vs=vs, H=ph, W=pw)
                for lx in range(2)]
        pf = jnp.repeat(jnp.repeat(pf4, repv, 0), reph, 1)[:ph, :pw]
        if acc_l is None:
            res = jnp.zeros((ph, pw), jnp.int32)
        elif is_luma:
            res = acc_l[:H, :W]
        else:
            res = acc_c[c - 1, :Hc, :Wc]
        if wt is not None:
            def up(a):
                return jnp.repeat(jnp.repeat(a.astype(jnp.int32),
                                             repv, 0), reph, 1)[:ph, :pw]
            wg, og = wt
            outs.append(combine_plane_w(
                puts[0], puts[1], pf, res, up(wg[0, c]), up(og[0, c]),
                up(wg[1, c]), up(og[1, c]), bit_depth=bd,
                denom=denoms[0 if is_luma else 1]))
        else:
            outs.append(combine_plane(puts[0], puts[1], pf, res,
                                      bit_depth=bd))
    luma = jnp.zeros((hl, wl), jnp.int32).at[
        OY:OY + H, OX:OX + W].set(outs[0])
    chroma = jnp.zeros((2, hc, wc), jnp.int32)
    chroma = chroma.at[0, OY:OY + Hc, OX:OX + Wc].set(outs[1])
    chroma = chroma.at[1, OY:OY + Hc, OX:OX + Wc].set(outs[2])
    return luma, chroma


@partial(jax.jit, static_argnames=("c", "H", "W", "Hc", "Wc"))
def _slice_plane(flat, *, c, H, W, Hc, Wc):
    """Plane c of a decoded picture's device-resident flat output
    (uint8/uint16 concat of Y, Cb, Cr) as an int32 [h, w] array —
    the device-resident-DPB read path (no host round trip)."""
    if c == 0:
        return flat[:H * W].reshape(H, W).astype(jnp.int32)
    if c == 1:
        return flat[H * W:H * W + Hc * Wc].reshape(Hc, Wc) \
            .astype(jnp.int32)
    return flat[H * W + Hc * Wc:H * W + 2 * Hc * Wc].reshape(Hc, Wc) \
        .astype(jnp.int32)


@partial(jax.jit, static_argnames=("caps", "hl", "wl", "hc", "wc", "H", "W",
                                   "Hc", "Wc", "bd", "npad", "prefill",
                                   "filters", "cs", "bdc", "sdis", "c444",
                                   "strong", "banded"))
def _frame_fused(arena4, arena16, escs, meta, nn, pre_l, pre_c, fargs=None,
                 bounds=None, ccp=None,
                 *, caps, hl, wl, hc, wc, H, W, Hc, Wc, bd, npad, prefill,
                 filters=0, cs=64, bdc=8, sdis=False, c444=False,
                 strong=False, banded=None):
    """ONE dispatch for the whole post-parse frame: dequant+IDCT per size
    bucket, residual scatter, fused Pallas intra wavefront, crop+downcast.
    Minimal dispatches AND minimal bytes: the tunneled runtime gives a
    ~55 MB/s SHARED up+down wire, so levels ship as 4-bit nibbles
    (+escape scatter), the sideband as 3 int16/block, and the intra meta
    as 8 rows with the derived rows rebuilt here on device."""
    from ..ops.intra_fused import _build, _build_banded, OY, OX
    acc_l, acc_c = _residual_acc(arena4, arena16, escs, caps=caps,
                                 H=H, W=W, Hc=Hc, Wc=Wc, bd=bd)
    if ccp is not None and acc_l is not None:
        # RExt cross-component prediction on device (hevc.c:1295-1362)
        acc_c = _apply_ccp(acc_l, acc_c, ccp, Hc, Wc)
    res_l = jnp.zeros((hl, wl), jnp.int32)
    res_c = jnp.zeros((2, hc, wc), jnp.int32)
    if acc_l is not None:
        res_l = res_l.at[OY:OY + H, OX:OX + W].set(acc_l[:H, :W])
        res_c = res_c.at[:, OY:OY + Hc, OX:OX + Wc].set(
            acc_c[:, :Hc, :Wc])
    if prefill:
        luma, chroma = pre_l, pre_c
    else:
        luma = jnp.zeros((hl, wl), jnp.int32)
        chroma = jnp.zeros((2, hc, wc), jnp.int32)
    meta16 = _derive_meta16(meta, sdis, c444, strong)
    if banded is None:
        luma, chroma = _build(hl, wl, hc, wc, npad, bd)(
            meta16, nn, luma, chroma, res_l, res_c)
    else:
        band_h, nbands = banded
        vsc = 0 if Hc == H else 1
        luma, chroma = _build_banded(hl, wl, hc, wc, npad, bd, band_h,
                                     vsc, nbands)(
            meta16, bounds, luma, chroma, res_l, res_c)
    if not filters:
        return _crop_pack(luma, chroma, H=H, W=W, Hc=Hc, Wc=Wc, bd=bd)
    # whole-frame deblock + SAO on device (ops/filters_jax.py);
    # filters bitmask: 1 = deblock, 2 = SAO (static)
    from ..ops.filters_jax import apply_filters_device
    yv = luma[OY:OY + H, OX:OX + W]
    cbv = chroma[0, OY:OY + Hc, OX:OX + Wc]
    crv = chroma[1, OY:OY + Hc, OX:OX + Wc]
    yv, cbv, crv = apply_filters_device(
        yv, cbv, crv, *fargs,
        bd=bd, bdc=bdc, cs=cs, do_deblock=bool(filters & 1),
        do_sao=bool(filters & 2),
        hs=0 if Wc == W else 1, vs=0 if Hc == H else 1)
    dt = jnp.uint8 if bd <= 8 else jnp.uint16
    return jnp.concatenate([yv.astype(dt).reshape(-1),
                            cbv.astype(dt).reshape(-1),
                            crv.astype(dt).reshape(-1)])


def _res_buckets(fs: FrameSymbols):
    """Residual TU buckets keyed by size, with absolute plane coords and
    pow2 row padding (padded rows get far-negative coords so the
    mode='drop' scatter discards them)."""
    raw = fs.native_raw
    out = {}
    sl = fs.active_scaling()
    if raw is not None:
        cm = raw["cb_meta"]
        arena = raw["cb_levels"]
        for s in SIZES:
            log2s = int(np.log2(s))
            sel = np.nonzero(cm[:, 3] == log2s)[0]
            if not len(sel):
                continue
            n = len(sel)
            cap = _round_bucket(n, 256)
            offs = cm[sel, 6]
            gather = offs[:, None] + np.arange(s * s)[None, :]
            levels = np.zeros((cap, s, s), np.int32)
            levels[:n] = arena[gather].reshape(n, s, s)
            qp = np.zeros(cap, np.int32)
            qp[:n] = cm[sel, 4]
            fl = cm[sel, 5]
            flags = np.zeros((cap, 5), bool)
            flags[:n, 0] = (fl & 1) != 0
            flags[:n, 1] = (fl & 2) != 0
            flags[:n, 2] = (fl & 4) != 0
            flags[:n, 3] = (fl & 16) != 0
            flags[:n, 4] = (fl & 8) != 0
            plane = np.full(cap, 0, np.int32)
            plane[:n] = cm[sel, 0]
            x = np.full(cap, FAR, np.int32)
            y = np.full(cap, FAR, np.int32)
            x[:n] = cm[sel, 1]
            y[:n] = cm[sel, 2]
            mid = np.full(cap, 6, np.int32)
            mid[:n] = 3 * ((fl & 32) != 0) + cm[sel, 0]
            out[s] = dict(levels=levels, qp=qp, flags=flags, plane=plane,
                          x=x, y=y, sm=_sm_for(sl, s, mid, flags[:, 1]))
        return out
    by_size = {s: [] for s in SIZES}
    for cb in fs.coeff_blocks:
        by_size[1 << cb.log2_size].append(cb)
    for s in SIZES:
        blocks = by_size[s]
        if not blocks:
            continue
        n = len(blocks)
        cap = _round_bucket(n, 256)
        levels = np.zeros((cap, s, s), np.int32)
        qp = np.zeros(cap, np.int32)
        flags = np.zeros((cap, 5), bool)
        plane = np.zeros(cap, np.int32)
        x = np.full(cap, FAR, np.int32)
        y = np.full(cap, FAR, np.int32)
        mid = np.full(cap, 6, np.int32)
        for i, cb in enumerate(blocks):
            levels[i] = cb.levels
            qp[i] = cb.qp
            flags[i] = (cb.is_dst, cb.transform_skip, cb.transquant_bypass,
                        cb.rdpcm_mode == 1, cb.rdpcm_mode >= 0)
            plane[i] = cb.plane
            x[i] = cb.x
            y[i] = cb.y
            mid[i] = cb.matrix_id
        out[s] = dict(levels=levels, qp=qp, flags=flags, plane=plane,
                      x=x, y=y, sm=_sm_for(sl, s, mid, flags[:, 1]))
    return out


@partial(jax.jit, static_argnames=("H", "W", "Hc", "Wc", "bd"))
def _crop_pack(luma, chroma, H, W, Hc, Wc, bd):
    from ..ops.intra_fused import OY, OX
    dt = jnp.uint8 if bd <= 8 else jnp.uint16
    y = luma[OY:OY + H, OX:OX + W].astype(dt).reshape(-1)
    u = chroma[0, OY:OY + Hc, OX:OX + Wc].astype(dt).reshape(-1)
    v = chroma[1, OY:OY + Hc, OX:OX + Wc].astype(dt).reshape(-1)
    return jnp.concatenate([y, u, v])


@partial(jax.jit, static_argnames=("hl", "wl", "H", "W"))
def _embed_luma(planes4, hl, wl, H, W):
    from ..ops.intra_fused import OY, OX
    return jnp.zeros((hl, wl), jnp.int32).at[
        OY:OY + H, OX:OX + W].set(planes4[0, :H, :W])


@partial(jax.jit, static_argnames=("hc", "wc", "Hc", "Wc"))
def _embed_chroma(planes4, hc, wc, Hc, Wc):
    from ..ops.intra_fused import OY, OX
    c = jnp.zeros((2, hc, wc), jnp.int32)
    c = c.at[0, OY:OY + Hc, OX:OX + Wc].set(planes4[1, :Hc, :Wc])
    return c.at[1, OY:OY + Hc, OX:OX + Wc].set(planes4[2, :Hc, :Wc])


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
