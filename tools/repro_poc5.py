#!/usr/bin/env python3
"""Capture the reconstruction inputs of one picture of a bench stream and
compare the legacy packed inter path vs the device prefill path vs the np
oracle, plane by plane. Usage: repro_poc5.py [config] [poc]"""
import os
import sys

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
        JaxEngine, _inter_prefill, _pack_arena, _res_buckets, pack_frame)
    from openhevc_tpu.ops.intra_fused import padded_dims, OY, OX
    from openhevc_tpu.decoder import Decoder
    import jax.numpy as jnp

    cap = {}
    orig = JaxEngine.reconstruct

    def spy(self, fs, ref_planes=None):
        if fs.poc == want_poc and fs.inter_pbs:
            # snapshot ref planes as host arrays NOW (content at use time)
            cap["fs"] = fs
            cap["refs"] = {p: [np.asarray(v[c], np.int32)
                               for c in range(3)]
                           for p, v in (ref_planes or {}).items()}
            cap["refs_obj"] = dict(ref_planes or {})
        return orig(self, fs, ref_planes=ref_planes)

    JaxEngine.reconstruct = spy
    try:
        d = Decoder("jax")
        d.decode(data)
        d.flush()
    finally:
        JaxEngine.reconstruct = orig
    fs = cap["fs"]
    print("refs:", sorted(cap["refs"]), "weights:", fs.weights is not None)

    sps = fs.sps
    H, W = sps.height, sps.width
    Hc, Wc = H >> sps.vshift1, W >> sps.hshift1
    hl, wl = padded_dims(H, W)
    hc, wc = padded_dims(Hc, Wc)

    # path A: legacy upload path from HOST copies of the refs
    engA = JaxEngine()
    interA = engA._pack_inter(fs, cap["refs"])
    pfA = pack_frame(fs)
    pfA.inter = interA
    planes4 = np.asarray(engA._run_inter_only(pfA))

    # path B: prefill from the DEVICE-RESIDENT ref objects
    engB = JaxEngine()
    interB = engB._pack_inter(fs, cap["refs_obj"])
    npk = fs.native_pack
    if npk is not None:
        arena4, arena16, escs, caps = (npk["arena4"], npk["arena16"],
                                       npk["esc"], npk["caps"])
    else:
        arena4, arena16, escs, caps = _pack_arena(_res_buckets(fs))
    wt = interB.get("wt")
    wt_dev = (jnp.asarray(wt["wg"]), jnp.asarray(wt["og"])) if wt else None
    denoms = tuple(wt["denoms"]) if wt else None
    luma, chroma = _inter_prefill(
        jnp.asarray(arena4), jnp.asarray(arena16), jnp.asarray(escs),
        jnp.asarray(interB["pf4"]), jnp.asarray(interB["mv"]),
        jnp.asarray(interB["slot"]),
        interB["hf"][0], interB["hf"][1], interB["hf"][2],
        wt=wt_dev, caps=caps, H=H, W=W, Hc=Hc, Wc=Wc,
        hl=hl, wl=wl, hc=hc, wc=wc, bd=sps.bit_depth,
        hs=sps.hshift1, vs=sps.vshift1, denoms=denoms)
    got = [np.asarray(luma)[OY:OY + H, OX:OX + W],
           np.asarray(chroma)[0, OY:OY + Hc, OX:OX + Wc],
           np.asarray(chroma)[1, OY:OY + Hc, OX:OX + Wc]]
    ok = True
    for c, (g, wdims) in enumerate(zip(got, [(H, W), (Hc, Wc), (Hc, Wc)])):
        w = planes4[c, :wdims[0], :wdims[1]]
        if not np.array_equal(g, w):
            d_ = g != w
            ys, xs = np.nonzero(d_)
            print(f"A-vs-B plane {c}: {d_.sum()} diffs bbox "
                  f"y[{ys.min()}:{ys.max()}] x[{xs.min()}:{xs.max()}]")
            ok = False
    print("prefill-vs-legacy:", "EQUAL" if ok else "DIFF")

    # also: device ref content vs host ref content
    for p, obj in cap["refs_obj"].items():
        dev = getattr(obj, "_dev", None)
        if dev is None:
            print(f"ref {p}: host-only")
            continue
        flat = np.asarray(dev).astype(np.int32)
        y = flat[:H * W].reshape(H, W)
        cb = flat[H * W:H * W + Hc * Wc].reshape(Hc, Wc)
        cr = flat[H * W + Hc * Wc:].reshape(Hc, Wc)
        hostp = cap["refs"][p]
        eq = [np.array_equal(a, b) for a, b in
              zip([y, cb, cr], hostp)]
        print(f"ref {p}: dev-vs-host {'EQUAL' if all(eq) else eq}")


if __name__ == "__main__":
    main()
