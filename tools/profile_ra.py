#!/usr/bin/env python3
"""Profile one bench config end-to-end with per-stage wall timers and a
coarse event trace of where the decode loop blocks (parse / pack / H2D /
dispatch / D2H). Usage: profile_ra.py [config_substr] [reps]"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ra_main"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import importlib
    bench = importlib.import_module("bench")
    for (name, gen, kind, nframes) in bench.CONFIGS:
        if which in name:
            break
    else:
        raise SystemExit(f"no config matches {which}")
    data = bench.ensure_stream(name, gen)
    from openhevc_tpu.decoder import Decoder, ShvcDecoder

    def mk():
        return ShvcDecoder("jax") if kind == "shvc" else Decoder("jax")

    # warm-up
    t0 = time.perf_counter()
    d = mk()
    pics = d.decode(data) + d.flush()
    print(f"warmup: {time.perf_counter() - t0:.2f}s, {len(pics)} pics",
          flush=True)

    for r in range(reps):
        d = mk()
        t0 = time.perf_counter()
        pics = d.decode(data) + d.flush()
        for p in pics:
            np.asarray(p.planes[0])
        dt = time.perf_counter() - t0
        t = d.timers if kind != "shvc" else d.el.timers
        print(f"rep{r}: {dt:.3f}s = {len(pics)/dt:.2f} fps  "
              f"stages={t.summary() if hasattr(t, 'summary') else {}}",
              flush=True)
        eng = d._jax_engine if kind != "shvc" else d.el._jax_engine
        if eng is not None and getattr(eng, "sync_times", None):
            print("  sync:", {k: round(v, 3)
                              for k, v in eng.sync_times.items()},
                  flush=True)


if __name__ == "__main__":
    main()
