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
