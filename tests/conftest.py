import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding logic is
# validated without TPU hardware (the driver separately dry-runs
# __graft_entry__.dryrun_multichip). Force cpu — the environment ships
# JAX_PLATFORMS=axon (the tunneled TPU), and a setdefault would leave the
# whole suite hostage to that link's noise; the fused-kernel TPU tests
# opt back in explicitly (test_fused_tpu.py, OPENHEVC_TPU_TESTS=1).
if os.environ.get("OPENHEVC_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
# persistent XLA compile cache: the suite's wall time is dominated by
# re-compiling the same fused-frame programs in every pytest process
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/openhevc_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_frames(W, H, n, rng, smooth=True):
    yy, xx = np.mgrid[0:H, 0:W]
    fr = []
    for i in range(n):
        if smooth:
            y = ((xx * 2 + yy * 3 + i * 10) % 256 * 0.7 +
                 rng.integers(0, 60, (H, W))).astype(np.uint8)
        else:
            y = rng.integers(0, 256, (H, W), dtype=np.uint8)
        u = ((xx[::2, ::2] + i * 7 + 128) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] * 2 + i * 3) % 256).astype(np.uint8)
        fr.append((y, u, v))
    return fr


def ref_decode(data: bytes):
    """Golden decode via the reference openHEVC build."""
    from tools.refdec import RefDecoder
    d = RefDecoder()
    try:
        return d.decode_stream(data)
    finally:
        d.close()


def ref_planes(f):
    import numpy as np
    nb = 2 if f.bit_depth > 8 else 1
    dt = np.uint16 if nb == 2 else np.uint8
    w, h = f.width, f.height
    cw = w if f.chroma_format == 2 else w // 2
    ch = h if f.chroma_format >= 1 else h // 2
    y = np.frombuffer(f.y, dtype=dt).reshape(h, w)
    u = np.frombuffer(f.u, dtype=dt).reshape(ch, cw)
    v = np.frombuffer(f.v, dtype=dt).reshape(ch, cw)
    return [y, u, v]
