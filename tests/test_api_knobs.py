"""Previously-inert API knobs made real: temporal-layer gating (vs the
reference wrapper's libOpenHevcSetTemporalLayer_id), VUI-derived
FrameInfo (frameRate / SAR), and the strict err_recognition mode."""
import numpy as np
import pytest

from conftest import make_frames


def _ra_stream_with_sublayers(rng, n=9):
    from openhevc_tpu.encoder.inter_enc import encode_ra_stream
    W, H = 96, 64
    fr = make_frames(W, H, n, rng)
    data, _ = encode_ra_stream(fr, W, H, qp=30, gop=8, ctb_log2=4,
                               seed=5, temporal_ids=True)
    return data


def _decode_pocs(data, temporal_layer=None):
    from openhevc_tpu.decoder import Decoder
    d = Decoder("np", temporal_layer=temporal_layer)
    pics = d.decode(data) + d.flush()
    return {p.poc: p.cropped() for p in pics}


def test_temporal_layer_gating_drops_sublayers(rng):
    """temporal_layer=k keeps only pictures with temporal_id <= k; the
    kept pictures decode identically to a full decode (sub-layer
    dropping is normatively safe: higher layers never feed lower).
    Parity: hevc.c:3306 temporal_id > temporal_layer_id skip."""
    data = _ra_stream_with_sublayers(rng)
    full = _decode_pocs(data)
    assert len(full) == 9
    # gop 8 pyramid: tid0 = {0, 8}, tid1 adds {4}, tid2 adds {2, 6}
    for (tl, want_pocs) in [(0, {0, 8}), (1, {0, 4, 8}),
                            (2, {0, 2, 4, 6, 8})]:
        got = _decode_pocs(data, temporal_layer=tl)
        assert set(got) == want_pocs, (tl, sorted(got))
        for poc in want_pocs:
            for c in range(3):
                assert np.array_equal(got[poc][c], full[poc][c]), (tl, poc)


def test_temporal_layer_matches_reference_decoder(rng):
    """Cross-check sub-layer selection against the reference openHEVC
    wrapper (openHevcWrapper.c:442 semantics: keeps tid <= val+1)."""
    from conftest import ref_planes
    from tools.refdec import RefDecoder
    data = _ra_stream_with_sublayers(rng)
    for val in (0, 1):
        d = RefDecoder(nb_threads=1, thread_type=1, temporal_layer=val)
        ref = d.decode_stream(data)
        d.close()
        got = _decode_pocs(data, temporal_layer=val + 1)
        assert len(ref) == len(got), (val, len(ref), len(got))
        for f, poc in zip(ref, sorted(got)):
            rp = ref_planes(f)
            for c in range(3):
                assert np.array_equal(np.asarray(got[poc][c]), rp[c]), \
                    (val, poc, c)


def test_api_temporal_layer_knob(rng):
    from openhevc_tpu.api import OpenHevc
    data = _ra_stream_with_sublayers(rng)
    h = OpenHevc(engine="np")
    h.start()
    h.set_temporal_layer_id(0)        # wrapper val 0 -> keep tid <= 1
    h.decode(data)
    h.flush()
    pocs = []
    while True:
        f = h.get_output(1)
        if f is None:
            break
        pocs.append(f.frame_info.display_picture_number)
    assert sorted(pocs) == [0, 4, 8]


def test_frame_info_vui(rng):
    """FrameInfo carries VUI timing (60 fps) and SAR — the
    openHevcWrapper.c:171-243 picture-info fields."""
    from openhevc_tpu.api import OpenHevc
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 64, 64
    fr = make_frames(W, H, 1, rng)
    data, _ = encode_intra_stream(fr, W, H, qp=30, ctb_log2=4, seed=77,
                                  vui_timing=True)
    h = OpenHevc(engine="np")
    h.start()
    h.decode(data)
    h.flush()
    f = h.get_output(1)
    assert f is not None
    assert f.frame_info.frameRate == (60000, 1000)
    assert f.frame_info.sample_aspect_ratio == (1, 1)


def test_strict_mode_raises_on_missing_ref(rng):
    """err_recognition strict mode: a P slice whose reference was never
    decoded raises DecodeError instead of concealing
    (AV_EF_EXPLODE, hevc.c:3497)."""
    from openhevc_tpu.decoder import Decoder, DecodeError, split_nals
    from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
    W, H = 64, 64
    fr = make_frames(W, H, 3, rng)
    data, _ = encode_lowdelay_stream(fr, W, H, qp=30, ctb_log2=4, seed=1)
    # drop the IDR's slice NAL: the first P now misses its reference
    nals = split_nals(data)
    keep = []
    dropped = False
    for n in nals:
        nt = (n[0] >> 1) & 0x3F
        if nt <= 31 and not dropped:
            dropped = True
            continue
        keep.append(b"\x00\x00\x01" + n)
    damaged = b"".join(keep)
    # default: conceals and decodes
    d = Decoder("np")
    pics = d.decode(damaged) + d.flush()
    assert pics
    # strict: raises
    d = Decoder("np", strict=True)
    with pytest.raises(DecodeError):
        d.decode(damaged)
        d.flush()


def test_decoder_config_dataclass():
    """DecoderConfig is the single typed knob home (SURVEY §5);
    constructor kwargs keep working and resolve through it."""
    from openhevc_tpu.config import DecoderConfig
    from openhevc_tpu.decoder import Decoder, ShvcDecoder
    c = DecoderConfig(engine="np", nb_threads=4, thread_type=2,
                      temporal_layer=1, strict=True)
    d = Decoder(config=c)
    assert d.engine == "np" and d.temporal_layer == 1 and d.strict
    assert d._parse_depth == 1 and d._parse_threads == 4
    # kwargs path resolves identically
    d2 = Decoder("np", nb_threads=4, thread_type=2, temporal_layer=1,
                 strict=True)
    assert (d2._parse_depth, d2._parse_threads) == (1, 4)
    # direct overrides win over nb_threads derivation
    c3 = DecoderConfig(engine="np", nb_threads=4, thread_type=2,
                       parse_ahead=3, parse_threads=2)
    assert c3.resolved_threads() == (3, 2)
    s = ShvcDecoder(config=DecoderConfig(engine="np"))
    assert s.bl.engine == "np" and s.el.layer == 1


def test_decoder_config_env(monkeypatch):
    from openhevc_tpu.config import DecoderConfig
    monkeypatch.setenv("OPENHEVC_PARSE_AHEAD", "5")
    monkeypatch.setenv("OPENHEVC_FETCH_BATCH", "3")
    c = DecoderConfig.from_env(engine="np")
    assert c.parse_ahead == 5 and c.fetch_batch == 3
    assert c.resolved_threads()[0] == 5
