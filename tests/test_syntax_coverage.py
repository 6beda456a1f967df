"""End-to-end coverage for three decode paths the in-repo encoder
formerly never emitted (VERDICT r3 gap #2): sign-data hiding
(hevc_cabac.c:1753 sign_hidden), cabac_init_flag init-table swap
(hevc_cabac.c:606 initType), and ref_pic_list_modification
(hevc.c:520). Streams are generated with the new encoder knobs and
cross-checked bit-exact against the reference decoder oracle through
the native parse path."""
import numpy as np
import pytest

from openhevc_tpu.decoder import Decoder, split_nals
from openhevc_tpu.encoder.intra_enc import (IntraFrameEncoder,
                                            encode_intra_stream)
from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream

from conftest import make_frames, ref_decode, ref_planes


def _check(data, n, W, H, engine="np"):
    want = ref_decode(data)
    d = Decoder(engine)
    got = d.decode(data) + d.flush()
    assert len(got) == len(want) == n
    for i, f in enumerate(want):
        for p, (g, w) in enumerate(zip(got[i].cropped(), ref_planes(f))):
            assert np.array_equal(np.asarray(g), w), (i, p)
    assert d.stats["python_slices"] == 0, d.stats
    return d


def _count_hidden(monkeypatch):
    created = []
    orig = IntraFrameEncoder.__init__

    def init(self, *a, **k):
        orig(self, *a, **k)
        created.append(self)

    monkeypatch.setattr(IntraFrameEncoder, "__init__", init)
    return created


# ---- sign-data hiding ----------------------------------------------------

@pytest.mark.parametrize("seed,kw", [
    (51, dict(qp=22)),                          # dense coeffs, big spans
    (52, dict(qp=28, sao=True, deblock=True)),
    (53, dict(qp=24, transform_skip=True)),     # SDH on TS blocks
    (54, dict(qp=24, bit_depth=10)),
])
def test_sdh_intra(seed, kw, monkeypatch):
    created = _count_hidden(monkeypatch)
    rng = np.random.default_rng(seed)
    W, H = 64, 64
    mx = 1024 if kw.get("bit_depth", 8) == 10 else 256
    frames = [tuple(rng.integers(0, mx, s).astype(
        np.uint16 if mx > 256 else np.uint8)
        for s in ((H, W), (H // 2, W // 2), (H // 2, W // 2)))
        for _ in range(2)]
    data, _ = encode_intra_stream(frames, W, H, ctb_log2=4, seed=seed,
                                  sign_data_hiding=True, **kw)
    assert sum(e.sdh_hidden_signs for e in created) > 0, \
        "no sign was actually hidden — test is vacuous"
    _check(data, 2, W, H)


def test_sdh_inter(monkeypatch):
    created = _count_hidden(monkeypatch)
    rng = np.random.default_rng(55)
    frames = make_frames(64, 64, 4, rng, smooth=False)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=24, ctb_log2=4,
                                     seed=55, n_refs=2, b_slices=True,
                                     sign_data_hiding=True)
    assert sum(e.sdh_hidden_signs for e in created) > 0
    _check(data, 4, 64, 64)


def test_sdh_jax_engine(monkeypatch):
    created = _count_hidden(monkeypatch)
    rng = np.random.default_rng(56)
    frames = make_frames(64, 64, 2, rng, smooth=False)
    data, _ = encode_intra_stream(frames, 64, 64, qp=24, ctb_log2=4,
                                  seed=56, sign_data_hiding=True)
    assert sum(e.sdh_hidden_signs for e in created) > 0
    _check(data, 2, 64, 64, engine="jax")


# ---- cabac_init_flag -----------------------------------------------------

def test_cabac_init_swap():
    """cabac_init_flag=1 swaps the P/B context init tables — a wrong
    initType corrupts the very first CTB, so oracle bit-exactness over
    P and B slices pins the swap logic (native + Python init paths)."""
    rng = np.random.default_rng(61)
    frames = make_frames(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=61, n_refs=2, b_slices=True,
                                     cabac_init=True)
    _check(data, 4, 64, 64)


def test_cabac_init_p_only():
    rng = np.random.default_rng(62)
    frames = make_frames(64, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=62, cabac_init=True)
    _check(data, 3, 64, 64)


# ---- ref_pic_list_modification -------------------------------------------

def test_list_modification_parsed():
    """The emitted slice headers carry an explicit rotated list_entry
    permutation (parse check: slice.py:151/_ref_list_mod)."""
    from openhevc_tpu.bitstream.slice import parse_slice_header
    from openhevc_tpu.bitstream import ps as PS
    from openhevc_tpu.bitstream.bits import unescape_rbsp
    rng = np.random.default_rng(63)
    frames = make_frames(64, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=63, n_refs=2,
                                     lists_modification=True)
    sps = pps = None
    mods = []
    for nal in split_nals(data):
        t = (nal[0] >> 1) & 0x3F
        rbsp = unescape_rbsp(nal[2:])
        if t == 33:
            sps = PS.parse_sps(rbsp)
        elif t == 34:
            pps = PS.parse_pps(rbsp)
        elif t <= 31:
            sh = parse_slice_header(rbsp, t, sps, pps)
            if sh.slice_type != 2 and sh.list_mod_l0:
                mods.append(sh.list_mod_l0)
    assert pps.lists_modification_present
    assert mods and all(m == [1, 0] for m in mods), mods


def test_list_modification_decode():
    rng = np.random.default_rng(64)
    frames = make_frames(64, 64, 5, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=64, n_refs=2, b_slices=True,
                                     lists_modification=True, tmvp=True)
    _check(data, 5, 64, 64)


# ---- all three at once ---------------------------------------------------

def test_combined_syntax(monkeypatch):
    created = _count_hidden(monkeypatch)
    rng = np.random.default_rng(65)
    frames = make_frames(64, 64, 5, rng, smooth=False)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=25, ctb_log2=4,
                                     seed=65, n_refs=2, b_slices=True,
                                     sign_data_hiding=True,
                                     cabac_init=True,
                                     lists_modification=True,
                                     sao=True, deblock=True)
    assert sum(e.sdh_hidden_signs for e in created) > 0
    _check(data, 5, 64, 64)
