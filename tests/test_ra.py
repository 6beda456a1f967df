"""Random-access (ra_main-style) decode: hierarchical-B GOPs with output
reordering, RPS follow-entry retention, CRA/RASL, RPS-driven DPB.

Every stream is cross-checked bit-exact against the reference decoder
(reordering/bumping truth: /root/reference/libavcodec/hevc_refs.c:182-269,
RPS marking: hevc_refs.c:637)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openhevc_tpu.decoder import Decoder
from openhevc_tpu.encoder.inter_enc import encode_ra_stream

from conftest import make_frames, ref_decode, ref_planes


def check(data, n, W, H, engine="np", **dec_kw):
    d = Decoder(engine, **dec_kw)
    pics = d.decode(data) + d.flush()
    ours = [p.cropped() for p in pics]
    ref = ref_decode(data)
    assert len(ref) == n and len(ours) == n
    # output arrives in POC (display) order despite decode-order coding
    assert [p.poc for p in pics] == sorted(p.poc for p in pics)
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        for c in range(3):
            assert np.array_equal(np.asarray(ours[i][c], np.int64),
                                  np.asarray(rp[c], np.int64)), (i, c)
    return d


@pytest.mark.parametrize("seed,kw", [
    (1, dict(qp=30, gop=8)),
    (2, dict(qp=32, gop=8, tmvp=True)),
    (3, dict(qp=30, gop=4, sao=True, deblock=True, n=13)),
    (4, dict(qp=33, gop=4, n=11)),          # tail GOP shorter than gop
])
def test_ra_pyramid(seed, kw):
    n = kw.pop("n", 17)
    rng = np.random.default_rng(seed)
    frames = make_frames(64, 64, n, rng)
    data, recons = encode_ra_stream(frames, 64, 64, seed=seed, **kw)
    d = check(data, n, 64, 64)
    # decode order differed from output order => reordering was real
    assert d.sps[0].num_reorder_pics > 0


def test_ra_reordering_is_live():
    """The stream must actually carry out-of-order pictures: decoding
    NALs one at a time yields pictures in bursts, not one per NAL."""
    rng = np.random.default_rng(11)
    frames = make_frames(64, 64, 9, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=30, gop=8, seed=11)
    d = Decoder("np")
    sizes = [len(d.decode(bytes(chunk))) for chunk in _split_aus(data)]
    sizes.append(len(d.flush()))
    assert max(sizes) > 1          # bumping released a reordered burst


def test_ra_cra_rasl_full():
    """CRA every 16 with RASL leading pictures, decoded from the start:
    everything outputs."""
    rng = np.random.default_rng(12)
    frames = make_frames(64, 64, 33, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=31, gop=8, seed=12,
                               intra_period=16)
    check(data, 33, 64, 64)


def test_ra_cra_rasl_start_at_cra():
    """Decode starting AT the mid-stream CRA: its RASL leading pictures
    must be dropped (max_ra gating, hevc.c:3375) — matching the
    reference decoder fed the same truncated stream."""
    rng = np.random.default_rng(13)
    frames = make_frames(64, 64, 33, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=31, gop=8, seed=13,
                               intra_period=16)
    # cut the stream at the CRA (nal type 21), keeping parameter sets
    from openhevc_tpu.decoder import split_nals
    from openhevc_tpu.bitstream.bits import wrap_nal
    nals = split_nals(data)
    keep, seen_cra = [], False
    for nal in nals:
        t = (nal[0] >> 1) & 0x3F
        if t in (32, 33, 34):
            keep.append(nal)
        elif t == 21:
            seen_cra = True
            keep.append(nal)
        elif seen_cra:
            keep.append(nal)
    assert seen_cra
    cut = b"".join(b"\x00\x00\x01" + n for n in keep)
    d = Decoder("np")
    pics = d.decode(cut) + d.flush()
    ref = ref_decode(cut)
    assert len(pics) == len(ref) and len(pics) < 33   # RASL dropped
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        for c in range(3):
            assert np.array_equal(
                np.asarray(pics[i].cropped()[c], np.int64),
                np.asarray(rp[c], np.int64))


def test_ra_dpb_is_rps_driven():
    """Reference retention must follow the RPS: after decoding a long
    stream the ref_pics dict stays bounded by the RPS working set, not
    a fixed window."""
    rng = np.random.default_rng(14)
    frames = make_frames(64, 64, 33, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=33, gop=8, seed=14)
    d = Decoder("np")
    d.decode(data)
    d.flush()
    # hierarchical GOP-8 needs at most ~5 live refs (anchors + pyramid)
    assert len(d.ref_pics) <= 6


def test_ra_native_parse():
    """The native C++ core must carry the whole RA stream (B slices,
    two lists, follow RPS entries) with no silent Python fallback."""
    rng = np.random.default_rng(15)
    frames = make_frames(64, 64, 17, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=31, gop=8, seed=15,
                               tmvp=True)
    d = check(data, 17, 64, 64, native_parse=True)
    assert d.stats["python_slices"] == 0
    assert d.stats["native_slices"] == 17


def _split_aus(data):
    """Yield one AU (frame) worth of bytes at a time."""
    from openhevc_tpu.decoder import split_nals
    nals = split_nals(data)
    cur = []
    for nal in nals:
        t = (nal[0] >> 1) & 0x3F
        if t <= 31 and cur and any(((c[0] >> 1) & 0x3F) <= 31
                                   for c in cur):
            yield b"".join(b"\x00\x00\x01" + n for n in cur)
            cur = []
        cur.append(nal)
    if cur:
        yield b"".join(b"\x00\x00\x01" + n for n in cur)
