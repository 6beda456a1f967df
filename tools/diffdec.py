#!/usr/bin/env python3
"""Decode a bench config with the jax engine and the np oracle; report
the first differing picture/plane and the diff bounding box.
Usage: diffdec.py [config_substr]"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def run(kind, data, engine):
    from openhevc_tpu.decoder import Decoder, ShvcDecoder
    d = ShvcDecoder(engine) if kind == "shvc" else Decoder(engine)
    pics = d.decode(data) + d.flush()
    return [(p.poc, [np.asarray(x) for x in p.cropped()]) for p in pics]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ra_main"
    import importlib
    bench = importlib.import_module("bench")
    for (name, gen, kind, nframes) in bench.CONFIGS:
        if which in name:
            break
    else:
        raise SystemExit(f"no config matches {which}")
    data = bench.ensure_stream(name, gen)
    a = run(kind, data, "jax")
    b = run(kind, data, "np")
    assert len(a) == len(b), (len(a), len(b))
    nbad = 0
    for (pa, pla), (pb, plb) in zip(a, b):
        assert pa == pb, (pa, pb)
        for c in range(3):
            if not np.array_equal(pla[c], plb[c]):
                d = pla[c] != plb[c]
                ys, xs = np.nonzero(d)
                print(f"poc {pa} plane {c}: {d.sum()} diffs, "
                      f"bbox y[{ys.min()}:{ys.max()}] x[{xs.min()}:"
                      f"{xs.max()}], max|d|="
                      f"{np.abs(pla[c] - plb[c]).max()}", flush=True)
                nbad += 1
    print("DONE", "MISMATCH" if nbad else "ALL EQUAL", flush=True)


if __name__ == "__main__":
    main()
