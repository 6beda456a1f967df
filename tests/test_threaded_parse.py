"""Threaded substream parse parity: the native core's multi-threaded
WPP-row / tile parse (entry-point driven, wavefront-synchronized) must
produce byte-identical outputs to its serial byte-aligned-continuation
path on the same slice."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import make_frames


def _collect(data, forced_serial):
    """Parse every slice natively; forced_serial drops the entry points
    so the serial path runs."""
    import openhevc_tpu.bitstream.native as nat
    from openhevc_tpu.decoder import Decoder
    outs = []
    orig = nat.parse_slice_native

    def spy(rbsp, sps, pps, sh, nal_type, poc, ref_list=None,
            ss_starts=None, **kw):
        if forced_serial:
            ss_starts = None
        else:
            assert ss_starts, "expected entry points on this stream"
        fs = orig(rbsp, sps, pps, sh, nal_type, poc, ref_list=ref_list,
                  ss_starts=ss_starts, **kw)
        outs.append(fs)
        return fs

    nat.parse_slice_native = spy
    try:
        d = Decoder("np")
        d.decode(data)
        d.flush()
    finally:
        nat.parse_slice_native = orig
    assert outs
    return outs


def _assert_fs_equal(a, b):
    for k in ("ipm", "pred_mode", "is_pcm", "tqb", "cbf_luma4",
              "bounds_v", "bounds_h", "qp_y4", "sao"):
        assert np.array_equal(getattr(a, k), getattr(b, k)), k
    ra, rb = a.native_raw, b.native_raw
    for k in ("cb_meta", "cb_levels", "ij_meta", "ij_avail"):
        assert np.array_equal(ra[k], rb[k]), k
    ma, mb = a.motion, b.motion
    assert np.array_equal(ma.pred_flag, mb.pred_flag)
    assert np.array_equal(ma.mv, mb.mv)
    assert np.array_equal(ma.refpoc, mb.refpoc)
    pa, pb_ = a.native_pack, b.native_pack
    if pa is not None or pb_ is not None:
        assert pa["caps"] == pb_["caps"]
        for k in ("arena4", "arena16", "esc", "meta"):
            assert np.array_equal(pa[k], pb_[k]), k


@pytest.mark.parametrize("enc_kw", [
    dict(wpp=True),
    dict(wpp=True, qp=12),
    dict(tile_cols=2, tile_rows=2),
    dict(tile_cols=3, tile_rows=1),
])
def test_threaded_parse_matches_serial_intra(rng, enc_kw):
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 128, 96
    fr = make_frames(W, H, 2, rng, smooth=enc_kw.get("qp", 30) > 16)
    data = encode_intra_stream(fr, W, H, ctb_log2=4, **enc_kw)[0]
    serial = _collect(data, forced_serial=True)
    threaded = _collect(data, forced_serial=False)
    assert len(serial) == len(threaded)
    for a, b in zip(threaded, serial):
        _assert_fs_equal(a, b)


def test_threaded_parse_matches_serial_wpp_p(rng):
    from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
    W, H = 128, 96
    fr = make_frames(W, H, 3, rng)
    data = encode_lowdelay_stream(fr, W, H, qp=30, ctb_log2=4,
                                  wpp=True)[0]
    serial = _collect(data, forced_serial=True)
    threaded = _collect(data, forced_serial=False)
    for a, b in zip(threaded, serial):
        _assert_fs_equal(a, b)
