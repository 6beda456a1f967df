"""The native C++ parse core must take the fast path (no silent Python
fallback) on the stream classes real content uses: TMVP, weighted pred,
multi-ref, WPP, tiles. decoder.stats counts which parser ran."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import ref_decode, ref_planes

from openhevc_tpu.decoder import Decoder
from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from test_inter import moving_frames


def check_native(data, n, expect_native=True):
    ref = ref_decode(data)
    d = Decoder("np", native_parse=True)
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == n
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)
    if expect_native:
        assert d.stats["python_slices"] == 0, d.stats
        assert d.stats["native_slices"] >= n - 1, d.stats


def test_native_tmvp():
    rng = np.random.default_rng(101)
    frames = moving_frames(96, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 96, 64, qp=30, ctb_log2=4,
                                     seed=101, tmvp=True)
    check_native(data, 4)


def test_native_tmvp_bslices():
    rng = np.random.default_rng(102)
    frames = moving_frames(96, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 96, 64, qp=28, ctb_log2=4,
                                     seed=102, tmvp=True,
                                     b_slices=True, n_refs=2)
    check_native(data, 4)


def test_native_weighted_pred():
    rng = np.random.default_rng(103)
    frames = moving_frames(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=103, weighted=True, n_refs=2)
    check_native(data, 4)


def test_native_tmvp_weighted_wpp():
    rng = np.random.default_rng(104)
    frames = moving_frames(128, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 128, 64, qp=30, ctb_log2=4,
                                     seed=104, tmvp=True,
                                     weighted=True, wpp=True)
    check_native(data, 3)


def test_native_cu_qp_delta():
    rng = np.random.default_rng(105)
    frames = moving_frames(96, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 96, 64, qp=30, ctb_log2=5,
                                  seed=105, cu_qp_delta_depth=1)
    check_native(data, 2)


def test_native_cu_qp_delta_wpp():
    rng = np.random.default_rng(106)
    frames = moving_frames(128, 96, 2, rng)
    data, _ = encode_intra_stream(frames, 128, 96, qp=32, ctb_log2=5,
                                  seed=106, cu_qp_delta_depth=2, wpp=True,
                                  sao=True, deblock=True)
    check_native(data, 2)


def test_native_tmvp_small_ctb():
    rng = np.random.default_rng(107)
    frames = moving_frames(128, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 128, 64, qp=30, ctb_log2=4,
                                     seed=107, tmvp=True)
    check_native(data, 3)


def test_native_multislice():
    rng = np.random.default_rng(108)
    frames = moving_frames(96, 96, 2, rng)
    data, _ = encode_intra_stream(frames, 96, 96, qp=30, ctb_log2=4,
                                  seed=108, num_slices=3)
    check_native(data, 2)


def test_native_multislice_dependent():
    rng = np.random.default_rng(109)
    frames = moving_frames(96, 96, 2, rng)
    data, _ = encode_intra_stream(frames, 96, 96, qp=30, ctb_log2=4,
                                  seed=109, num_slices=3,
                                  dependent_slices=True)
    check_native(data, 2)


def test_native_multislice_inter_tmvp():
    rng = np.random.default_rng(110)
    frames = moving_frames(96, 96, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 96, 96, qp=30, ctb_log2=4,
                                     seed=110, tmvp=True, num_slices=2)
    check_native(data, 3)


def test_native_multislice_filters_cuqp():
    rng = np.random.default_rng(111)
    frames = moving_frames(128, 96, 2, rng)
    data, _ = encode_intra_stream(frames, 128, 96, qp=32, ctb_log2=5,
                                  seed=111, num_slices=2, sao=True,
                                  deblock=True, cu_qp_delta_depth=1)
    check_native(data, 2)


# ---- RExt + chroma-format catch-up (round 2) ----------------------------

def _native_exact(data, n):
    d = Decoder("np")
    pics = d.decode(data) + d.flush()
    ref = ref_decode(data)
    assert len(ref) == len(pics) == n
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        for c in range(3):
            assert np.array_equal(
                np.asarray(pics[i].cropped()[c], np.int64),
                np.asarray(rp[c], np.int64)), (i, c)
    assert d.stats["python_slices"] == 0, d.stats
    assert d.stats["native_slices"] == n
    return d


def _frames444(W, H, n, rng):
    yy, xx = np.mgrid[0:H, 0:W]
    return [((((xx * 2 + yy * 3 + i * 10) % 256) * 0.7 +
              rng.integers(0, 60, (H, W))).astype(np.uint8),
             ((xx + i * 7 + 128) % 256).astype(np.uint8),
             ((yy * 2 + i * 3) % 256).astype(np.uint8))
            for i in range(n)]


def test_native_444_intra():
    rng = np.random.default_rng(201)
    data, _ = encode_intra_stream(_frames444(64, 64, 3, rng), 64, 64,
                                  qp=32, seed=201, chroma_format_idc=3)
    _native_exact(data, 3)


def test_native_444_inter_b():
    rng = np.random.default_rng(202)
    data, _ = encode_lowdelay_stream(_frames444(64, 64, 4, rng), 64, 64,
                                     qp=32, seed=202,
                                     chroma_format_idc=3, n_refs=2,
                                     b_slices=True)
    _native_exact(data, 4)


def test_native_422_intra():
    rng = np.random.default_rng(203)
    data, _ = encode_intra_stream(_frames444(64, 64, 3, rng), 64, 64,
                                  qp=31, seed=203, chroma_format_idc=2)
    _native_exact(data, 3)


def test_native_rext_tools():
    """rotation / implicit RDPCM / persistent rice through the native
    core, bit-exact vs the reference oracle."""
    rng = np.random.default_rng(204)
    from conftest import make_frames
    fr = make_frames(64, 64, 3, rng, smooth=False)
    for kw in (dict(rext_rotation=True, transform_skip=True),
               dict(rext_implicit_rdpcm=True, transform_skip=True),
               dict(rext_persistent_rice=True, transform_skip=True,
                    qp=24)):
        qp = kw.pop("qp", 32)
        data, _ = encode_intra_stream(fr, 64, 64, qp=qp, seed=204, **kw)
        _native_exact(data, 3)


def test_native_rext_wpp_persistent_rice():
    """StatCoeff rides the WPP context snapshots (CTX_STATE_BYTES)."""
    rng = np.random.default_rng(205)
    from conftest import make_frames
    fr = make_frames(96, 64, 2, rng, smooth=False)
    data, _ = encode_intra_stream(fr, 96, 64, qp=24, seed=205, wpp=True,
                                  rext_persistent_rice=True,
                                  transform_skip=True)
    _native_exact(data, 2)
