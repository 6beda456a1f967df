#!/usr/bin/env python3
"""Compare the nibble-arena residual path (_residual_acc) against the
int32-bucket residual (pack_frame -> residual_bucket/scatter_blocks)
for one captured picture of a bench stream."""
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
        JaxEngine, _residual_acc, _pack_arena, _res_buckets, pack_frame)
    from openhevc_tpu.ops.idct import residual_bucket, scatter_blocks
    from openhevc_tpu.decoder import Decoder
    import jax.numpy as jnp

    cap = {}
    orig = JaxEngine.reconstruct

    class _Captured(Exception):
        pass

    def spy(self, fs, ref_planes=None):
        if fs.poc == want_poc and fs.inter_pbs:
            cap["fs"] = fs
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
    sps = fs.sps
    H, W = sps.height, sps.width
    Hc, Wc = H >> sps.vshift1, W >> sps.hshift1

    npk = fs.native_pack
    src = "native_pack" if npk is not None else "_pack_arena"
    if npk is not None:
        arena4, arena16, escs, caps = (npk["arena4"], npk["arena16"],
                                       npk["esc"], npk["caps"])
    else:
        arena4, arena16, escs, caps = _pack_arena(_res_buckets(fs))
    print("arena source:", src, "caps:", caps)
    acc_l, acc_c = _residual_acc(
        jnp.asarray(arena4), jnp.asarray(arena16), jnp.asarray(escs),
        caps=caps, H=H, W=W, Hc=Hc, Wc=Wc, bd=sps.bit_depth)
    got = [np.asarray(acc_l)[:H, :W],
           np.asarray(acc_c)[0, :Hc, :Wc],
           np.asarray(acc_c)[1, :Hc, :Wc]]

    pf = pack_frame(fs)
    planes = jnp.zeros((4, H, W), jnp.int32)
    for s in (4, 8, 16, 32):
        b = pf.res[s]
        if b is None:
            continue
        fl = b["flags"]
        sm = b.get("sm")
        r = residual_bucket(jnp.asarray(b["levels"]), jnp.asarray(b["qp"]),
                            jnp.asarray(fl[:, 0]), jnp.asarray(fl[:, 1]),
                            jnp.asarray(fl[:, 2]), jnp.asarray(fl[:, 3]),
                            jnp.asarray(fl[:, 4]), s=s,
                            bit_depth=sps.bit_depth,
                            sm=None if sm is None else jnp.asarray(sm))
        planes = scatter_blocks(planes, r, jnp.asarray(b["plane"]),
                                jnp.asarray(b["bx"]), jnp.asarray(b["by"]),
                                s=s)
    want = [np.asarray(planes)[0, :H, :W],
            np.asarray(planes)[1, :Hc, :Wc],
            np.asarray(planes)[2, :Hc, :Wc]]
    for c in range(3):
        if not np.array_equal(got[c], want[c]):
            d_ = got[c] != want[c]
            ys, xs = np.nonzero(d_)
            print(f"plane {c}: {d_.sum()} residual diffs bbox "
                  f"y[{ys.min()}:{ys.max()}] x[{xs.min()}:{xs.max()}] "
                  f"maxd={np.abs(got[c]-want[c]).max()}")
        else:
            print(f"plane {c}: residual EQUAL")


if __name__ == "__main__":
    main()
