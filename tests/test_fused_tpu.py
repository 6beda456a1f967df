"""Fused Pallas intra kernel parity tests (TPU hardware only).

The main suite runs on a virtual CPU mesh (conftest.py), where the fused
whole-frame kernel cannot execute (Mosaic targets real TPUs and interpret
mode is too slow for full frames).  These tests run the kernel on the
actual chip and are enabled with OPENHEVC_TPU_TESTS=1, e.g.:

    OPENHEVC_TPU_TESTS=1 JAX_PLATFORMS='' python -m pytest tests/test_fused_tpu.py -v

They are also exercised (unguarded) by the perf harness before every
benchmark run.
"""
import os

import numpy as np
import pytest

from conftest import make_frames

pytestmark = pytest.mark.skipif(
    os.environ.get("OPENHEVC_TPU_TESTS") != "1"
    or os.environ.get("JAX_PLATFORMS", "") == "cpu",
    reason="requires real TPU (set OPENHEVC_TPU_TESTS=1, unset "
           "JAX_PLATFORMS)")


def _roundtrip(frames, W, H, qp, bit_depth=8):
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    from openhevc_tpu.decoder import Decoder
    data, _ = encode_intra_stream(frames, W, H, qp=qp, ctb_log2=6, seed=0,
                                  bit_depth=bit_depth)
    dj = Decoder("jax")
    pj = dj.decode(data) + dj.flush()
    dn = Decoder("np")
    pn = dn.decode(data) + dn.flush()
    assert len(pj) == len(pn) == len(frames)
    for a, b in zip(pj, pn):
        for c in range(3):
            assert np.array_equal(a.planes[c], b.planes[c]), \
                f"poc {a.poc} plane {c}"


def test_fused_intra_bitexact_small(rng):
    import jax
    assert jax.default_backend() == "tpu"
    frames = make_frames(128, 128, 2, rng)
    _roundtrip(frames, 128, 128, qp=30)


def test_fused_intra_bitexact_noise(rng):
    frames = make_frames(192, 128, 1, rng, smooth=False)
    _roundtrip(frames, 192, 128, qp=22)


def test_fused_intra_bitexact_bench_size(rng):
    frames = make_frames(832, 480, 1, rng)
    _roundtrip(frames, 832, 480, qp=32)
