"""Device-side decode of the wire formats (CPU-runnable).

_frame_fused consumes 4-bit nibble levels (+ escape pairs), a packed
3-int16 sideband, and an 8-row intra meta whose derived rows are rebuilt
on device. These tests check the device-side inverse transforms against
the original parsed values, independent of TPU hardware."""
import numpy as np

from conftest import make_frames


def _parse_streams(data):
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
        dummy = None
        recon = Decoder._reconstruct

        def stub(self, fs, refs):
            nonlocal dummy
            if dummy is None:
                H, W = fs.sps.height, fs.sps.width
                dummy = [np.zeros((H, W), np.int32),
                         np.zeros((H // 2, W // 2), np.int32),
                         np.zeros((H // 2, W // 2), np.int32)]
            return dummy

        Decoder._reconstruct = stub
        d = Decoder("jax")
        d.decode(data)
        d.flush()
        Decoder._reconstruct = recon
    finally:
        nat.parse_slice_native = orig
    assert fss
    return fss


def _roundtrip_stream(rng, qp, smooth):
    import openhevc_tpu.models.pipeline as pl
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 96, 64
    fr = make_frames(W, H, 2, rng, smooth=smooth)
    data = encode_intra_stream(fr, W, H, qp=qp)[0]
    saw_byte_mode = False
    for fs in _parse_streams(data):
        buckets = pl._res_buckets(fs)
        arena4, a16, escs, caps = pl._pack_arena(buckets)
        # payload must be strictly smaller than the dense nibble form
        dense = sum(c * s * s // 2 for s, c, _h, _n in caps)
        assert arena4.size <= pl._round_bucket(dense, 4096)
        for (s, _cap, _hs, _ne, x, y, qpf, _sm, lv) in \
                pl._arena_levels(arena4, a16, escs, caps):
            b = buckets[s]
            assert np.array_equal(np.asarray(lv), b["levels"]), s
            assert np.array_equal(np.asarray(x), b["x"])
            assert np.array_equal(np.asarray(y), b["y"])
        cw_rows = _cw_rows(a16, caps)
        saw_byte_mode |= any((row >> 12).any() for row in cw_rows)
    return saw_byte_mode


def _cw_rows(a16, caps):
    rows, off = [], 0
    for s, cap, has_sm, _ne in caps:
        if cap == 0:
            continue
        rows.append(np.asarray(a16[off + 3 * cap:off + 4 * cap]))
        off += 4 * cap + (cap * s * s if has_sm else 0)
    return rows


def test_scan_prefix_levels_roundtrip(rng):
    """Device rebuild of the v2 scan-prefix payload (nibble + byte-mode
    TUs + escape scatter) == original parsed levels."""
    # dense, many escapes: exercises byte-mode TUs
    assert _roundtrip_stream(rng, qp=8, smooth=False)


def test_scan_prefix_levels_roundtrip_sparse(rng):
    """Typical-QP content: short prefixes, nibble mode."""
    _roundtrip_stream(rng, qp=32, smooth=True)


def test_meta16_derivation(rng):
    """_derive_meta16(8-row upload) == the full 16-row meta computed on
    the host from the Python parser's per-job fields."""
    import jax
    import openhevc_tpu.models.pipeline as pl
    from openhevc_tpu.ops.intra_fused import (pack_meta_objects, _ANG,
                                              _INV, OY, OX)
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 96, 64
    fr = make_frames(W, H, 2, rng)
    data = encode_intra_stream(fr, W, H, qp=30, ctb_log2=5)[0]
    for fs in _parse_streams(data):
        fs.ensure_objects()
        jobs = fs.intra_jobs
        if not jobs:
            continue
        meta8 = pack_meta_objects(jobs)
        sps = fs.sps
        got = np.asarray(jax.jit(
            pl._derive_meta16, static_argnums=(1, 2, 3))(
                meta8, bool(getattr(sps, "intra_smoothing_disabled", 0)),
                sps.chroma_format_idc == 3,
                bool(sps.strong_intra_smoothing)))
        # host oracle: the original full pack_meta field set
        n = len(jobs)
        planes = np.array([j.plane for j in jobs])
        szs = np.array([j.size for j in jobs])
        modes = np.array([j.mode for j in jobs])
        filts = np.array([j.filter_refs for j in jobs])
        md = np.minimum(np.abs(modes - 26), np.abs(modes - 10))
        thr = np.select([szs == 8, szs == 16, szs == 32], [7, 1, 0], 99)
        assert np.array_equal(
            got[5, :n], (filts != 0) & (szs > 4) & (modes != 1) & (md > thr))
        assert np.array_equal(got[8, :n], _ANG[modes])
        assert np.array_equal(got[9, :n], _INV[modes])
        assert np.array_equal(
            got[10, :n],
            (szs == 32) & bool(sps.strong_intra_smoothing) & (planes == 0))
        assert np.array_equal(got[12, :n], (szs < 32) & (planes == 0))
        av_any = np.array([j.avail.any() for j in jobs])
        assert np.array_equal(got[11, :n] != 0, av_any)
        # pass-through rows
        assert np.array_equal(got[0, :n],
                              np.array([j.y for j in jobs]) + OY)
        assert np.array_equal(got[1, :n],
                              np.array([j.x for j in jobs]) + OX)
        assert np.array_equal(got[3, :n], modes)
