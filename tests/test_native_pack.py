"""Native hevc_pack_frame parity: the C++ packer must reproduce the
Python packing (_res_buckets/_pack_arena + pack_meta) byte-for-byte —
same arenas, escape lists, caps layout key, and [16, npad] intra meta.
The Python packers remain the correctness mirror (used for the
scaling-list path), so any drift between the two is a bug."""
import numpy as np
import pytest

from conftest import make_frames


def _collect_fs(data):
    """Decode while spying on the native slice parser; returns the parsed
    FrameSymbols list (each carrying native_raw + native_pack)."""
    import openhevc_tpu.bitstream.native as nat
    from openhevc_tpu.decoder import Decoder
    fss = []
    orig = nat.parse_slice_native

    def spy(*a, **k):
        fs = orig(*a, **k)
        fss.append(fs)
        return fs

    nat.parse_slice_native = spy
    try:
        d = Decoder("jax")
        d.decode(data)
        d.flush()
    finally:
        nat.parse_slice_native = orig
    assert fss, "native parse core was not used"
    return fss


def _assert_pack_matches(fs):
    import openhevc_tpu.models.pipeline as pl
    from openhevc_tpu.ops.intra_fused import pack_meta_native, _bucket

    npk = fs.native_pack
    assert npk is not None
    a4, a16, esc, caps = pl._pack_arena(pl._res_buckets(fs))
    assert caps == npk["caps"]
    assert np.array_equal(a4, npk["arena4"])
    assert np.array_equal(a16, npk["arena16"])
    assert np.array_equal(esc, npk["esc"])
    meta = pack_meta_native(fs.native_raw)
    n = meta.shape[1]
    npad = _bucket(n)
    if npad != n:
        meta = np.concatenate(
            [meta, np.zeros((meta.shape[0], npad - n), meta.dtype)],
            axis=1)
    assert np.array_equal(meta, npk["meta"])


@pytest.mark.parametrize("cfg", [
    dict(qp=30),
    dict(qp=8),                      # dense levels: int8 escape path
    dict(qp=30, ctb_log2=5),         # 32x32 TBs + strong smoothing sizes
    dict(qp=30, transform_skip=True),
])
def test_native_pack_intra(rng, cfg):
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 96, 64
    fr = make_frames(W, H, 2, rng, smooth=cfg["qp"] > 16)
    data = encode_intra_stream(fr, W, H, **cfg)[0]
    for fs in _collect_fs(data):
        _assert_pack_matches(fs)


def test_native_pack_lowdelay(rng):
    from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
    W, H = 96, 64
    fr = make_frames(W, H, 3, rng)
    data = encode_lowdelay_stream(fr, W, H, qp=30)[0]
    for fs in _collect_fs(data):
        _assert_pack_matches(fs)


def test_native_pack_skipped_with_scaling_lists(rng):
    """Scaling lists ride the Python pack path (has_sm arenas)."""
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 64, 64
    fr = make_frames(W, H, 1, rng)
    data = encode_intra_stream(fr, W, H, qp=30, scaling_list="default")[0]
    for fs in _collect_fs(data):
        assert fs.native_pack is None
