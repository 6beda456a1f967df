"""Terminal display sink + yuv4mpeg2 writer (the main_hm/sdl.c /
SDL_framerate.c roles, dependency-free)."""
import io

import numpy as np

from openhevc_tpu.display import (yuv_to_rgb, render_frame, y4m_header,
                                  y4m_frame, TerminalDisplay)


def test_yuv_to_rgb_anchors():
    # black, white, pure-ish red in BT.601 limited range
    y = np.array([[16, 235, 81]], np.int32)
    u = np.array([[128, 128, 90]], np.int32)
    v = np.array([[128, 128, 240]], np.int32)
    rgb = yuv_to_rgb(y, u, v)
    assert rgb.shape == (1, 3, 3)
    assert (rgb[0, 0] == [0, 0, 0]).all()
    assert (rgb[0, 1] == [255, 255, 255]).all()
    assert rgb[0, 2, 0] > 200 and rgb[0, 2, 1] < 60 and rgb[0, 2, 2] < 60


def test_yuv_to_rgb_10bit():
    rgb = yuv_to_rgb(np.full((2, 2), 940), np.full((2, 2), 512),
                     np.full((2, 2), 512), bit_depth=10)
    assert (rgb == 255).all()


def test_render_frame_dims_and_ansi():
    rng = np.random.default_rng(0)
    y = rng.integers(16, 235, (48, 64))
    u = rng.integers(16, 240, (24, 32))     # 4:2:0 chroma size
    v = rng.integers(16, 240, (24, 32))
    art = render_frame([y, u, v], cols=20)
    lines = art.split("\n")
    # every line renders exactly 20 half-block cells and resets style
    for ln in lines:
        assert ln.count("▀") == 20
        assert ln.endswith("\x1b[0m")
    assert len(lines) >= 2


def test_terminal_display_paces_and_writes():
    out = io.StringIO()
    d = TerminalDisplay(fps=1000.0, cols=16, out=out)
    y = np.full((16, 16), 128)
    c = np.full((8, 8), 128)
    d.show([y, c, c])
    d.show([y, c, c])
    s = out.getvalue()
    assert s.count("▀") > 0
    assert "\x1b[2J" in s                  # first frame clears
    assert d._shown == 2


def test_y4m_roundtrip_header_and_frames():
    hdr = y4m_header(64, 48, 30, 1, hs=1, vs=1, bit_depth=8)
    assert hdr == b"YUV4MPEG2 W64 H48 F30:1 Ip A0:0 C420jpeg\n"
    assert b"C444p10" in y4m_header(8, 8, 25, 1, hs=0, vs=0,
                                    bit_depth=10)
    y = np.arange(64 * 48, dtype=np.int32).reshape(48, 64) & 255
    u = np.full((24, 32), 1, np.int32)
    v = np.full((24, 32), 2, np.int32)
    fr = y4m_frame([y, u, v])
    assert fr.startswith(b"FRAME\n")
    assert len(fr) == 6 + 64 * 48 + 2 * 24 * 32
    got_y = np.frombuffer(fr[6:6 + 64 * 48], np.uint8).reshape(48, 64)
    assert np.array_equal(got_y, y.astype(np.uint8))
