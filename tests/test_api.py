"""openHEVC-shaped API, CLI, and SEI MD5 conformance machinery."""
import subprocess
import sys

import numpy as np

from conftest import make_frames, ref_decode

from openhevc_tpu.api import OpenHevc
from openhevc_tpu.encoder.intra_enc import encode_intra_stream


def _stream(tmp_path):
    rng = np.random.default_rng(5)
    frames = make_frames(64, 64, 2, rng)
    data, recons = encode_intra_stream(frames, 64, 64, qp=30, seed=5,
                                       md5_sei=True)
    path = tmp_path / "t.265"
    path.write_bytes(data)
    return data, recons, path


def test_api_decode_with_md5(tmp_path):
    data, recons, _ = _stream(tmp_path)
    d = OpenHevc(engine="np")
    d.set_check_md5(True)
    d.start()
    d.decode(data)
    d.flush()
    frames = []
    while True:
        fr = d.get_output(1)
        if fr is None:
            break
        frames.append(fr)
    assert len(frames) == len(recons)
    for fr, want in zip(frames, recons):
        for p, w in zip(fr.planes, want):
            assert np.array_equal(p, w)
    info = frames[0].frame_info
    assert (info.nWidth, info.nHeight, info.nBitDepth) == (64, 64, 8)


def test_reference_accepts_our_md5_sei(tmp_path):
    data, _, _ = _stream(tmp_path)
    out = ref_decode(data)   # reference with default settings decodes fine
    assert len(out) == 2


def test_cli_yuv_output(tmp_path):
    import os
    data, recons, path = _stream(tmp_path)
    out_yuv = tmp_path / "out.yuv"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "openhevc_tpu", "-i", str(path),
         "-o", str(out_yuv), "-e", "np", "-q"],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr
    exp = b"".join(np.asarray(p).astype(np.uint8).tobytes()
                   for rec in recons for p in rec)
    assert out_yuv.read_bytes() == exp


def test_hvcc_extradata_input():
    """hvcC extradata + length-prefixed packets (hevc_decode_extradata,
    hevc.c:4412) decode identically to the Annex-B form."""
    from openhevc_tpu.decoder import split_nals
    rng = np.random.default_rng(21)
    frames = make_frames(64, 64, 2, rng)
    data, recons = encode_intra_stream(frames, 64, 64, qp=30, seed=21)
    ps = {32: [], 33: [], 34: []}
    aus = []
    for nal in split_nals(data):
        t = (nal[0] >> 1) & 0x3F
        (ps[t] if t in ps else aus).append(nal)
    hvcc = bytes([1]) + bytes(20) + bytes([0xFC | 3]) + bytes([3])
    for t in (32, 33, 34):
        hvcc += bytes([t]) + len(ps[t]).to_bytes(2, "big")
        for nal in ps[t]:
            hvcc += len(nal).to_bytes(2, "big") + nal
    h = OpenHevc(engine="np")
    h.start()
    h.copy_extradata(hvcc)
    out = []
    for nal in aus:
        h.decode(len(nal).to_bytes(4, "big") + nal)
        while (fr := h.get_output()) is not None:
            out.append(fr)
    h.flush()
    while (fr := h.get_output()) is not None:
        out.append(fr)
    assert len(out) == len(recons)
    for fr, want in zip(out, recons):
        for p, w in zip(fr.planes, want):
            assert np.array_equal(p, w)


def test_au_parser():
    """AU boundary detection (ff_hevc_parser behavior): multi-slice AUs
    stay whole, parameter sets attach to the following AU, chunked
    feeding reassembles, and per-AU info reports pict_type/IRAP."""
    import numpy as np
    from conftest import make_frames
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    from openhevc_tpu.bitstream.au_parser import AuParser, au_info
    rng = np.random.default_rng(131)
    frames = make_frames(64, 64, 3, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=131, num_slices=2)
    p = AuParser()
    aus = p.feed(data) + p.flush()
    assert len(aus) == 3
    assert b"".join(aus) == data
    i0 = au_info(aus[0])
    assert i0.pict_type == "I" and i0.irap and i0.idr
    assert 32 in i0.nal_types and 33 in i0.nal_types  # VPS+SPS ride AU 0
    assert sum(1 for t in i0.nal_types if t <= 31) == 2  # 2 slice segs
    # chunked feeding (7-byte pieces)
    p = AuParser()
    aus2 = []
    for i in range(0, len(data), 7):
        aus2 += p.feed(data[i:i + 7])
    aus2 += p.flush()
    assert aus2 == aus


def test_mp4_roundtrip(tmp_path):
    """MP4 mux/demux (container/mp4.py, the mov.c role): wrap an encoded
    stream into ISO-BMFF, demux it back, decode via hvcC extradata +
    length-prefixed samples, and drive the CLI on the .mp4 file."""
    import numpy as np
    import subprocess, sys
    from conftest import make_frames
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    from openhevc_tpu.encoder.hevc_enc import (EncoderConfig, write_vps,
                                               write_sps, write_pps)
    from openhevc_tpu.container import mux_mp4, demux_mp4, is_mp4
    from openhevc_tpu.container.mp4 import (make_hvcc,
                                            annexb_to_length_prefixed)
    from openhevc_tpu.bitstream.au_parser import AuParser
    from openhevc_tpu.decoder import Decoder, split_nals
    rng = np.random.default_rng(161)
    W, H = 64, 64
    frames = make_frames(W, H, 3, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=30, ctb_log2=4,
                                       seed=161)
    # split into AUs; parameter sets go into hvcC
    p = AuParser()
    aus = p.feed(data) + p.flush()
    ps = {t: n for n in split_nals(aus[0]) if
          (t := (n[0] >> 1) & 0x3F) in (32, 33, 34)}
    hvcc = make_hvcc(ps[32], ps[33], ps[34])
    samples = [annexb_to_length_prefixed(au) for au in aus]
    mp4 = mux_mp4(samples, hvcc, W, H)
    assert is_mp4(mp4)
    hvcc2, samples2, nls = demux_mp4(mp4)
    assert hvcc2 == hvcc and samples2 == samples and nls == 4
    d = Decoder("np")
    d.set_extradata(hvcc2)
    pics = []
    for s in samples2:
        pics += d.decode(s)
    pics += d.flush()
    assert len(pics) == 3
    for i, pic in enumerate(pics):
        for p_, (got, want) in enumerate(zip(pic.cropped(), recons[i])):
            assert np.array_equal(got, want), (i, p_)
    # CLI end-to-end on the mp4
    f = tmp_path / "t.mp4"
    f.write_bytes(mp4)
    out = tmp_path / "o.yuv"
    r = subprocess.run([sys.executable, "-m", "openhevc_tpu", "-i", str(f),
                        "-o", str(out), "-e", "np", "-c"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    want = b"".join(np.asarray(pl, np.uint8).tobytes()
                    for rec in recons for pl in rec)
    assert out.read_bytes() == want


def test_ts_roundtrip(tmp_path):
    """MPEG-TS mux/demux (container/ts.py, the mpegts.c role): packetize
    an encoded stream into 188-byte TS with PAT/PMT/PES, demux the
    elementary stream back bit-exact, decode it, and drive the CLI on
    the .ts file."""
    from openhevc_tpu.container import mux_ts, demux_ts, is_ts
    from openhevc_tpu.bitstream.au_parser import AuParser
    from openhevc_tpu.decoder import Decoder
    rng = np.random.default_rng(171)
    W, H = 64, 64
    frames = make_frames(W, H, 3, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=30, ctb_log2=4,
                                       seed=171)
    p = AuParser()
    aus = p.feed(data) + p.flush()
    ts = mux_ts(aus)
    assert is_ts(ts) and len(ts) % 188 == 0
    assert not is_ts(data)
    es = demux_ts(ts)
    assert es == b"".join(aus)
    d = Decoder("np")
    pics = d.decode(es) + d.flush()
    assert len(pics) == 3
    for i, pic in enumerate(pics):
        for p_, (got, want) in enumerate(zip(pic.cropped(), recons[i])):
            assert np.array_equal(got, want), (i, p_)
    # CLI end-to-end on the .ts
    f = tmp_path / "t.ts"
    f.write_bytes(ts)
    out = tmp_path / "o.yuv"
    r = subprocess.run([sys.executable, "-m", "openhevc_tpu", "-i", str(f),
                        "-o", str(out), "-e", "np", "-c"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    want = b"".join(np.asarray(pl, np.uint8).tobytes()
                    for rec in recons for pl in rec)
    assert out.read_bytes() == want


def test_mkv_roundtrip(tmp_path):
    """Matroska mux/demux (container/mkv.py, the matroskadec.c role):
    wrap length-prefixed HEVC samples + hvcC into an EBML Segment,
    demux back bit-exact, decode via extradata, and drive the CLI."""
    from openhevc_tpu.container import mux_mkv, demux_mkv, is_mkv
    from openhevc_tpu.container.mp4 import (make_hvcc,
                                            annexb_to_length_prefixed)
    from openhevc_tpu.bitstream.au_parser import AuParser
    from openhevc_tpu.decoder import Decoder, split_nals
    rng = np.random.default_rng(191)
    W, H = 64, 64
    frames = make_frames(W, H, 3, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=30, ctb_log2=4,
                                       seed=191)
    p = AuParser()
    aus = p.feed(data) + p.flush()
    ps = {t: n for n in split_nals(aus[0]) if
          (t := (n[0] >> 1) & 0x3F) in (32, 33, 34)}
    hvcc = make_hvcc(ps[32], ps[33], ps[34])
    samples = [annexb_to_length_prefixed(au) for au in aus]
    mkv = mux_mkv(samples, hvcc, W, H)
    assert is_mkv(mkv) and not is_mkv(data)
    hvcc2, samples2, nls = demux_mkv(mkv)
    assert hvcc2 == hvcc and samples2 == samples and nls == 4
    d = Decoder("np")
    d.set_extradata(hvcc2)
    pics = []
    for s in samples2:
        pics += d.decode(s)
    pics += d.flush()
    assert len(pics) == 3
    for i, pic in enumerate(pics):
        for p_, (got, want) in enumerate(zip(pic.cropped(), recons[i])):
            assert np.array_equal(got, want), (i, p_)
    # CLI end-to-end on the .mkv
    f = tmp_path / "t.mkv"
    f.write_bytes(mkv)
    out = tmp_path / "o.yuv"
    r = subprocess.run([sys.executable, "-m", "openhevc_tpu", "-i", str(f),
                        "-o", str(out), "-e", "np", "-c"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    want = b"".join(np.asarray(pl, np.uint8).tobytes()
                    for rec in recons for pl in rec)
    assert out.read_bytes() == want


def test_mkv_long_stream_clusters():
    """mux_mkv splits Clusters before the int16 relative timestamp
    would overflow (matroskaenc.c behavior): a 900-frame stream at
    25 fps (36 s) round-trips."""
    from openhevc_tpu.container import mux_mkv, demux_mkv
    samples = [bytes((0, 0, 0, 2, 0x26, i & 0xFF)) for i in range(900)]
    hvcc = bytes(22) + bytes([3]) + b"\x00"       # minimal, nls=4
    mkv = mux_mkv(samples, hvcc, 64, 64, fps=25)
    _hvcc2, samples2, _nls = demux_mkv(mkv)
    assert samples2 == samples


def test_mkv_blockgroup_and_lacing():
    """demux_mkv handles BlockGroup/Block wrapping and all three lacing
    modes (matroskadec.c matroska_parse_laces role)."""
    from openhevc_tpu.container import demux_mkv
    from openhevc_tpu.container.mkv import (
        _el, _el_uint, EBML_HEADER, SEGMENT, TRACKS, TRACK_ENTRY,
        TRACK_NUMBER, TRACK_TYPE, CODEC_ID, CODEC_PRIVATE, CLUSTER,
        TIMESTAMP, SIMPLE_BLOCK, BLOCK_GROUP, BLOCK, HEVC_CODEC_ID)
    hvcc = bytes(22) + bytes([3]) + b"\x00"
    frames = [bytes([k] * (3 + k)) for k in range(5)]

    def blk(payload, flags):
        return b"\x81\x00\x00" + bytes([flags]) + payload

    # BlockGroup/Block, no lacing
    bg = _el(BLOCK_GROUP, _el(BLOCK, blk(frames[0], 0x00)))
    # Xiph lacing: 2 frames in one SimpleBlock
    xiph = blk(bytes([1, len(frames[1])]) + frames[1] + frames[2], 0x02)
    # EBML lacing: 2 frames (first size vint, last implicit)
    ebml_sz = bytes([0x80 | len(frames[3])])
    ebml = blk(bytes([1]) + ebml_sz + frames[3] + frames[4], 0x06)
    # fixed lacing: 2 equal frames
    eq = bytes([7] * 4)
    fixed = blk(bytes([1]) + eq + eq, 0x04)
    cluster = _el(CLUSTER, _el_uint(TIMESTAMP, 0) + bg +
                  _el(SIMPLE_BLOCK, xiph) + _el(SIMPLE_BLOCK, ebml) +
                  _el(SIMPLE_BLOCK, fixed))
    track = _el(TRACKS, _el(TRACK_ENTRY,
                _el_uint(TRACK_NUMBER, 1) + _el_uint(TRACK_TYPE, 1) +
                _el(CODEC_ID, HEVC_CODEC_ID) + _el(CODEC_PRIVATE, hvcc)))
    data = _el(EBML_HEADER, b"") + _el(SEGMENT, track + cluster)
    _h, samples, _n = demux_mkv(data)
    assert samples == frames + [eq, eq]


def test_ts_multipacket_psi_and_pes_header():
    """demux_ts accumulates PSI sections and PES headers across packet
    boundaries (mpegts.c write_section_data role) and the mux stamps a
    PCR on the video PID (PCR_PID declared in the PMT)."""
    from openhevc_tpu.container import mux_ts, demux_ts
    from openhevc_tpu.container.ts import (_ts_packets, _psi_section,
                                           TS_PKT, PMT_PID, HEVC_PID,
                                           HEVC_STREAM_TYPE)
    es = b"\x00\x00\x01\x40\x01" + bytes(range(256)) * 3
    # PCR present in the muxed stream: some video-PID packet has
    # adaptation-field PCR_flag set
    ts = mux_ts([es])
    found_pcr = False
    for off in range(0, len(ts), TS_PKT):
        pkt = ts[off:off + TS_PKT]
        pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
        if pid == HEVC_PID and (pkt[3] >> 4) & 2 and pkt[4] > 0:
            found_pcr |= bool(pkt[5] & 0x10)
    assert found_pcr
    assert demux_ts(ts) == es
    # hand-built: PMT padded past one packet + a 250-byte PES header
    cc = {}
    out = bytearray()
    pat_body = bytes((0x00, 0x01, 0xE0 | (PMT_PID >> 8), PMT_PID & 0xFF))
    out += _ts_packets(0, b"\x00" + _psi_section(0x00, 1, pat_body),
                       cc, True)
    pmt_body = bytes((0xE0 | (HEVC_PID >> 8), HEVC_PID & 0xFF,
                      0xF0, 0x00, HEVC_STREAM_TYPE,
                      0xE0 | (HEVC_PID >> 8), HEVC_PID & 0xFF,
                      0xF2, 0x00)) + b"\xff" * 0x200   # huge ES info
    out += _ts_packets(PMT_PID, b"\x00" + _psi_section(0x02, 1, pmt_body),
                       cc, True)
    hdr_len = 250                                     # spans 2 packets
    pes = b"\x00\x00\x01\xe0\x00\x00" + bytes((0x80, 0x00, hdr_len)) + \
        b"\xff" * hdr_len + es
    out += _ts_packets(HEVC_PID, pes, cc, True)
    assert demux_ts(bytes(out)) == es


def test_ogg_roundtrip(tmp_path):
    """Ogg page layer (container/ogg.py, the oggdec.c role): BOS
    mapping + lacing + CRC round-trip, incl. packets larger than one
    page's lacing capacity and a corrupt-page resync; decode + CLI."""
    from openhevc_tpu.container import mux_ogg, demux_ogg, is_ogg
    from openhevc_tpu.container.mp4 import (make_hvcc,
                                            annexb_to_length_prefixed)
    from openhevc_tpu.bitstream.au_parser import AuParser
    from openhevc_tpu.decoder import Decoder, split_nals
    rng = np.random.default_rng(201)
    W, H = 64, 64
    frames = make_frames(W, H, 3, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=30, ctb_log2=4,
                                       seed=201)
    p = AuParser()
    aus = p.feed(data) + p.flush()
    ps = {t: n for n in split_nals(aus[0]) if
          (t := (n[0] >> 1) & 0x3F) in (32, 33, 34)}
    hvcc = make_hvcc(ps[32], ps[33], ps[34])
    samples = [annexb_to_length_prefixed(au) for au in aus]
    ogg = mux_ogg(samples, hvcc)
    assert is_ogg(ogg) and not is_ogg(data)
    hvcc2, samples2, nls = demux_ogg(ogg)
    assert hvcc2 == hvcc and samples2 == samples and nls == 4
    # corrupt one page body byte: that page's packet drops, stream
    # still demuxes (CRC resync, oggdec.c behavior)
    bad = bytearray(ogg)
    off = ogg.find(samples[1][:8])
    bad[off] ^= 0xFF
    _h, s_bad, _n = demux_ogg(bytes(bad))
    assert len(s_bad) < len(samples)
    # big packet: laced over many 255-segments
    big = bytes(rng.integers(0, 256, 70000, dtype=np.uint8))
    _h, s_big, _n = demux_ogg(mux_ogg([big], hvcc))
    assert s_big == [big]
    d = Decoder("np")
    d.set_extradata(hvcc2)
    pics = []
    for s in samples2:
        pics += d.decode(s)
    pics += d.flush()
    assert len(pics) == 3
    for i, pic in enumerate(pics):
        for p_, (got, want) in enumerate(zip(pic.cropped(), recons[i])):
            assert np.array_equal(got, want), (i, p_)
    f = tmp_path / "t.ogg"
    f.write_bytes(ogg)
    out = tmp_path / "o.yuv"
    r = subprocess.run([sys.executable, "-m", "openhevc_tpu", "-i", str(f),
                        "-o", str(out), "-e", "np", "-c"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    want = b"".join(np.asarray(pl, np.uint8).tobytes()
                    for rec in recons for pl in rec)
    assert out.read_bytes() == want
