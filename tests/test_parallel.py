"""Mesh-sharded wave decode (openhevc_tpu/parallel/): independent
pictures reconstruct as ONE batched dispatch sharded over the `frame`
axis of an 8-virtual-device CPU mesh, bit-identical to the sequential
np-engine decode (which is itself oracle-checked elsewhere)."""
import numpy as np
import pytest

from openhevc_tpu.decoder import Decoder
from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.encoder.inter_enc import encode_ra_stream

from conftest import make_frames


def _mesh(n=8):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(np.array(devs[:n]), ("frame",))


def _compare(data, n):
    ref = Decoder("np")
    want = [p.cropped() for p in (ref.decode(data) + ref.flush())]
    d = Decoder("jax", mesh=_mesh())
    got = [p.cropped() for p in (d.decode(data) + d.flush())]
    assert len(got) == len(want) == n
    for i in range(n):
        for c in range(3):
            assert np.array_equal(np.asarray(got[i][c], np.int64),
                                  np.asarray(want[i][c], np.int64)), (i, c)
    return d


def test_wave_intra_stream():
    """16 intra pictures over an 8-device mesh: two full waves."""
    rng = np.random.default_rng(21)
    frames = make_frames(64, 64, 16, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, seed=21)
    d = _compare(data, 16)
    assert not d._wave                    # everything flushed


def test_wave_intra_filters_pcm():
    """Waves with device in-loop filters + PCM no-filter blocks."""
    rng = np.random.default_rng(22)
    frames = make_frames(64, 64, 9, rng, smooth=False)
    data, _ = encode_intra_stream(frames, 64, 64, qp=34, ctb_log2=4,
                                  seed=22, pcm=True, sao=True,
                                  deblock=True)
    _compare(data, 9)


def test_wave_mixed_ra_stream():
    """RA pyramid: intra anchors wave, inter pictures ride the
    sequential path; output order and bit-exactness preserved."""
    rng = np.random.default_rng(23)
    frames = make_frames(64, 64, 17, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=31, gop=8, seed=23,
                               intra_period=8)
    _compare(data, 17)


def test_wave_odd_count_padding():
    """Wave of 5 on an 8-device mesh: shard padding replicates the last
    frame and drops the copies."""
    rng = np.random.default_rng(24)
    frames = make_frames(48, 32, 5, rng)
    data, _ = encode_intra_stream(frames, 48, 32, qp=30, seed=24)
    _compare(data, 5)
