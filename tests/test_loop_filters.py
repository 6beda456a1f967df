"""Deblocking + SAO conformance vs the reference decoder.

Streams are generated with random SAO parameters per CTB and deblocking
enabled; output must be bit-exact against the reference build (which also
pins the reference's 16x16-CTB SAO halo timing quirk — see ops/sao_np.py).
"""
import numpy as np
import pytest

from conftest import make_frames, ref_decode, ref_planes

from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.decoder import Decoder


@pytest.mark.parametrize("W,H,qp,ctb,seed,pcm,sao,dbk", [
    (64, 64, 30, 4, 1, False, False, True),    # deblock only
    (64, 64, 35, 5, 2, False, True, False),    # SAO only
    (64, 64, 30, 4, 3, False, True, True),     # both, CTB16 halo quirk
    (96, 64, 26, 4, 4, True, True, True),      # + PCM
    (64, 64, 40, 6, 5, False, True, True),     # CTB 64
    (80, 48, 20, 4, 6, False, True, True),     # low QP, strong filtering
])
def test_loop_filters(W, H, qp, ctb, seed, pcm, sao, dbk):
    rng = np.random.default_rng(seed)
    frames = make_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(frames, W, H, qp=qp, ctb_log2=ctb,
                                  seed=seed, pcm=pcm, sao=sao, deblock=dbk)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 2
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_loop_filters_jax_engine():
    rng = np.random.default_rng(3)
    W, H = 64, 64
    frames = make_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(frames, W, H, qp=30, ctb_log2=4, seed=3,
                                  sao=True, deblock=True)
    ref = ref_decode(data)
    d = Decoder("jax")
    mine = d.decode(data) + d.flush()
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_deblock_with_cu_qp_delta():
    """Deblocking tc/beta lookups read the per-CU QP map (get_qPy,
    hevc_filter.c:145): decode a cu_qp_delta stream with deblocking on
    and compare against the reference decoder."""
    import numpy as np
    from conftest import ref_decode, ref_planes, make_frames
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    from openhevc_tpu.decoder import Decoder
    rng = np.random.default_rng(81)
    W, H = 96, 64
    frames = make_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(frames, W, H, qp=33, ctb_log2=5, seed=81,
                                  cu_qp_delta_depth=1, deblock=True,
                                  sao=True)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 2
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)
