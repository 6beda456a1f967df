"""Oracle cross-checks at production resolutions (the round-1 suite
topped out at 96x64): 832x480 (the BQMall/i_main class) and 1080p,
CTB 64, multi-frame GOPs. Catches boundary/wraparound and DPB-pressure
bugs that toy frames systematically miss."""
import pytest

pytestmark = pytest.mark.slow

import numpy as np

from openhevc_tpu.decoder import Decoder
from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.encoder.inter_enc import encode_ra_stream

from conftest import make_frames, ref_decode, ref_planes


def _check(data, n, native_expected=True):
    d = Decoder("np")
    pics = d.decode(data) + d.flush()
    ref = ref_decode(data)
    assert len(ref) == len(pics) == n
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        got = pics[i].cropped()
        for c in range(3):
            assert np.array_equal(np.asarray(got[c], np.int64),
                                  np.asarray(rp[c], np.int64)), (i, c)
    if native_expected:
        assert d.stats["python_slices"] == 0, d.stats


def test_scale_832x480_intra_wpp():
    rng = np.random.default_rng(31)
    fr = make_frames(832, 480, 3, rng)
    data, _ = encode_intra_stream(fr, 832, 480, qp=32, ctb_log2=6,
                                  seed=31, wpp=True)
    _check(data, 3)


def test_scale_832x480_ra_gop8():
    """8-frame GOP with reordering, TMVP, CTB 64 at real resolution."""
    rng = np.random.default_rng(32)
    fr = make_frames(832, 480, 9, rng)
    data, _ = encode_ra_stream(fr, 832, 480, qp=35, gop=8, ctb_log2=6,
                               min_cb_log2=3, seed=32, tmvp=True)
    _check(data, 9)


def test_scale_832x480_ra_filters():
    rng = np.random.default_rng(33)
    fr = make_frames(832, 480, 5, rng)
    data, _ = encode_ra_stream(fr, 832, 480, qp=35, gop=4, ctb_log2=6,
                               min_cb_log2=3, seed=33, sao=True,
                               deblock=True)
    _check(data, 5)


def test_scale_1080p_ra():
    """1920x1080 (MinCbSizeY 8) random access, oracle bit-exact."""
    rng = np.random.default_rng(34)
    fr = make_frames(1920, 1080, 3, rng)
    data, _ = encode_ra_stream(fr, 1920, 1080, qp=37, gop=2, ctb_log2=6,
                               min_cb_log2=3, seed=34, tmvp=True)
    _check(data, 3)
