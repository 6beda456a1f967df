#!/usr/bin/env python3
"""Time the device-side stages of one captured inter frame:
hf prefilter, _inter_prefill (residual+MC+combine), _frame_fused
(fused intra + filters), with block_until_ready around each."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ra_main"
    want_poc = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import importlib
    bench = importlib.import_module("bench")
    for (name, gen, kind, nframes) in bench.CONFIGS:
        if which in name:
            break
    data = bench.ensure_stream(name, gen)

    from openhevc_tpu.models.pipeline import (
        JaxEngine, _inter_prefill, _pack_arena, _res_buckets, _frame_fused)
    from openhevc_tpu.ops.intra_fused import (padded_dims, band_plan,
                                              pack_meta_native,
                                              pack_meta_objects,
                                              sort_meta_by_band, _bucket)
    from openhevc_tpu.ops.mc import mc_hprefilter
    from openhevc_tpu.decoder import Decoder
    import jax
    import jax.numpy as jnp

    cap = {}

    class _Captured(Exception):
        pass

    orig = JaxEngine.reconstruct

    def spy(self, fs, ref_planes=None):
        if fs.poc == want_poc and fs.inter_pbs:
            cap["fs"] = fs
            cap["refs"] = {p: [np.asarray(v[c], np.int32) for c in range(3)]
                           for p, v in (ref_planes or {}).items()}
            raise _Captured()
        return orig(self, fs, ref_planes=ref_planes)

    JaxEngine.reconstruct = spy
    try:
        d = Decoder("jax")
        try:
            d.decode(data)
            d.flush()
        except _Captured:
            pass
    finally:
        JaxEngine.reconstruct = orig
    fs = cap["fs"]
    refs = cap["refs"]
    sps = fs.sps
    H, W = sps.height, sps.width
    Hc, Wc = H >> sps.vshift1, W >> sps.hshift1
    plan0 = band_plan(H, W, Hc, Wc, sps.ctb_size, sps.vshift1)
    if plan0 is not None:
        _bh, _nb, hl, wl, hc, wc = plan0
    else:
        hl, wl = padded_dims(H, W)
        hc, wc = padded_dims(Hc, Wc)
    bd = sps.bit_depth

    def t(fn, n=5):
        fn()  # compile
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    # refs on device
    dev_refs = {p: [jnp.asarray(pl) for pl in pls]
                for p, pls in refs.items()}
    jax.block_until_ready(dev_refs)

    from openhevc_tpu.ops.mc import mc_prefilter_pairs
    ms = t(lambda: [mc_hprefilter(dev_refs[p][c], bit_depth=bd,
                                  is_luma=(c == 0))
                    for p in dev_refs for c in range(3)])
    print(f"hf prefilter ALL {len(dev_refs)} refs x3 planes: {ms:.1f} ms")
    ms = t(lambda: [mc_prefilter_pairs(dev_refs[p][c], bit_depth=bd,
                                       is_luma=(c == 0))
                    for p in dev_refs for c in range(3)])
    print(f"pairs prefilter ALL refs x3 planes: {ms:.1f} ms")

    eng = JaxEngine()
    inter = eng._pack_inter(fs, refs)
    npk = fs.native_pack
    if npk is not None:
        arena4, arena16, escs, caps = (npk["arena4"], npk["arena16"],
                                       npk["esc"], npk["caps"])
    else:
        arena4, arena16, escs, caps = _pack_arena(_res_buckets(fs))
    a4, a16, esc = (jnp.asarray(arena4), jnp.asarray(arena16),
                    jnp.asarray(escs))
    md = inter["md"]
    midx, mvals = jnp.asarray(md["idx"]), jnp.asarray(md["vals"])
    hf = inter["hf"]
    jax.block_until_ready((a4, a16, esc, midx, mvals, hf))

    pairs = inter.get("pairs", False)
    print("mc mode:", "pairs" if pairs else "taps")

    def run_prefill():
        return _inter_prefill(
            a4, a16, esc, midx, mvals, hf[0], hf[1], hf[2],
            caps=caps, H=H, W=W, Hc=Hc, Wc=Wc, hl=hl, wl=wl, hc=hc,
            wc=wc, bd=bd, hs=sps.hshift1, vs=sps.vshift1,
            h4=md["h4"], w4=md["w4"], pairs=pairs)

    ms = t(run_prefill)
    print(f"_inter_prefill (residual+MC+combine): {ms:.1f} ms")

    luma, chroma = run_prefill()
    jax.block_until_ready((luma, chroma))

    np_ = fs.native_pack
    if np_ is not None:
        meta, n = np_["meta"], np_["n"]
    else:
        meta = pack_meta_native(fs.native_raw) if fs.native_raw is not None \
            else pack_meta_objects(fs.intra_jobs)
        n = meta.shape[1]
        npad = _bucket(n)
        if npad != n:
            meta = np.concatenate(
                [meta, np.zeros((meta.shape[0], npad - n), meta.dtype)],
                axis=1)
    npad = meta.shape[1]
    plan = plan0
    band_h, nb, hl2, wl2, hc2, wc2 = plan
    meta2, bounds = sort_meta_by_band(meta, n, band_h, sps.vshift1, nb)
    from openhevc_tpu.ops.filters_jax import (device_filters_ok,
                                              prep_filters, fargs_arrays)
    fargs = None
    fmask = 0
    if device_filters_ok(fs):
        pff = prep_filters(fs)
        if pff is not None:
            fmask = (1 if pff["do_deblock"] else 0) | \
                    (2 if pff["do_sao"] else 0)
            fargs = tuple(jnp.asarray(a) for a in fargs_arrays(pff))
    print(f"n intra jobs: {n}, npad: {npad}, bands: {nb}, fmask: {fmask}")
    ms = t(lambda: _frame_fused(
        a4, a16, esc, meta2, np.full((1, 1), n, np.int32),
        luma, chroma, fargs, jnp.asarray(bounds), None,
        caps=caps, hl=hl2, wl=wl2, hc=hc2, wc=wc2, H=H, W=W, Hc=Hc,
        Wc=Wc, bd=bd, npad=npad, prefill=True, filters=fmask,
        cs=sps.ctb_size, bdc=sps.bit_depth_chroma,
        sdis=bool(getattr(sps, "intra_smoothing_disabled", 0)),
        c444=sps.chroma_format_idc == 3,
        strong=bool(sps.strong_intra_smoothing),
        banded=(band_h, nb)))
    print(f"_frame_fused (banded intra + filters): {ms:.1f} ms")

    # breakdown: fused without filters
    ms = t(lambda: _frame_fused(
        a4, a16, esc, meta2, np.full((1, 1), n, np.int32),
        luma, chroma, None, jnp.asarray(bounds), None,
        caps=caps, hl=hl2, wl=wl2, hc=hc2, wc=wc2, H=H, W=W, Hc=Hc,
        Wc=Wc, bd=bd, npad=npad, prefill=True, filters=0,
        cs=sps.ctb_size, bdc=sps.bit_depth_chroma,
        sdis=bool(getattr(sps, "intra_smoothing_disabled", 0)),
        c444=sps.chroma_format_idc == 3,
        strong=bool(sps.strong_intra_smoothing),
        banded=(band_h, nb)))
    print(f"_frame_fused (no filters): {ms:.1f} ms")


if __name__ == "__main__":
    main()
