"""Main10 / transform-skip / transquant-bypass / B-slice conformance."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import ref_decode, ref_planes, make_frames

from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
from openhevc_tpu.decoder import Decoder
from test_inter import moving_frames


def frames10(W, H, n, rng):
    yy, xx = np.mgrid[0:H, 0:W]
    fr = []
    for i in range(n):
        y = ((xx * 8 + yy * 12 + i * 40) % 1024 * 0.7 +
             rng.integers(0, 240, (H, W))).astype(np.uint16)
        u = ((xx[::2, ::2] * 4 + 512) % 1024).astype(np.uint16)
        v = ((yy[::2, ::2] * 8) % 1024).astype(np.uint16)
        fr.append((y, u, v))
    return fr


def check(data, n, W, H):
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == n
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_main10_intra():
    rng = np.random.default_rng(24)
    frames = frames10(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=24, bit_depth=10)
    check(data, 2, 64, 64)


def test_main10_intra_filters():
    rng = np.random.default_rng(25)
    frames = frames10(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=26, ctb_log2=5,
                                  seed=25, bit_depth=10, sao=True,
                                  deblock=True)
    check(data, 2, 64, 64)


def test_transform_skip():
    rng = np.random.default_rng(21)
    frames = moving_frames(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=21, transform_skip=True)
    check(data, 2, 64, 64)


def test_transquant_bypass_with_filters_single_frame():
    # single frame: the reference's cross-frame is_pcm/tqb no-filter leak
    # (hevc_frame_start never resets is_pcm) cannot manifest
    rng = np.random.default_rng(23)
    frames = moving_frames(64, 64, 1, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=28, ctb_log2=5,
                                  seed=23, transform_skip=True,
                                  transquant_bypass=True, sao=True,
                                  deblock=True)
    check(data, 1, 64, 64)


def test_transquant_bypass_multiframe_nofilters():
    rng = np.random.default_rng(22)
    frames = moving_frames(64, 64, 3, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=22, transquant_bypass=True)
    check(data, 3, 64, 64)


@pytest.mark.parametrize("seed,nref,sao,dbk,mm", [
    (11, 1, False, False, 5),
    (13, 2, True, True, 4),
])
def test_lowdelay_b(seed, nref, sao, dbk, mm):
    rng = np.random.default_rng(seed)
    frames = moving_frames(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=seed, n_refs=nref, sao=sao,
                                     deblock=dbk, max_merge=mm,
                                     b_slices=True)
    check(data, 4, 64, 64)


def test_main10_lowdelay_p():
    rng = np.random.default_rng(31)
    frames = frames10(64, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=31, bit_depth=10)
    check(data, 3, 64, 64)


# ---- Range extension: 4:4:4 chroma (intra) -------------------------------

def frames444(W, H, n, rng, maxval=256):
    dt = np.uint16 if maxval > 256 else np.uint8
    return [tuple(rng.integers(0, maxval, (H, W)).astype(dt)
                  for _ in range(3)) for _ in range(n)]


@pytest.mark.parametrize("seed,kw", [
    (41, dict(qp=30, min_cb_log2=3)),                     # NxN per-PU chroma
    (42, dict(qp=32, min_cb_log2=3, sao=True, deblock=True)),
    (43, dict(qp=30, min_cb_log2=3, bit_depth=10)),
    (44, dict(qp=30, min_cb_log2=3, transform_skip=True)),
    (45, dict(qp=30, min_cb_log2=3, transquant_bypass=True)),
    (46, dict(qp=34, W=96, H=64, ctb_log2=5)),            # 32x32 chroma TBs
])
def test_rext_444_intra(seed, kw):
    rng = np.random.default_rng(seed)
    W, H = kw.pop("W", 64), kw.pop("H", 64)
    maxval = 1024 if kw.get("bit_depth", 8) == 10 else 256
    frames = frames444(W, H, 2, rng, maxval)
    data, _ = encode_intra_stream(frames, W, H, ctb_log2=kw.pop("ctb_log2", 4),
                                  seed=seed, chroma_format_idc=3, **kw)
    check(data, 2, W, H)


def test_rext_444_jax_engine():
    rng = np.random.default_rng(47)
    frames = frames444(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  min_cb_log2=3, seed=47, sao=True,
                                  deblock=True, chroma_format_idc=3)
    ref = ref_decode(data)
    d = Decoder("jax")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 2
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def _mv_frames444(W, H, n, rng):
    base = [rng.integers(0, 256, (H * 2, W * 2)).astype(np.uint8)
            for _ in range(3)]
    out = []
    for _ in range(n):
        dx = int(rng.integers(0, W // 2))
        dy = int(rng.integers(0, H // 2))
        out.append(tuple(b[dy:dy + H, dx:dx + W].copy() for b in base))
    return out


@pytest.mark.parametrize("seed,kw", [
    (51, dict(n_refs=1)),
    (52, dict(n_refs=2, b_slices=True, sao=True, deblock=True)),
])
def test_rext_444_inter(seed, kw):
    rng = np.random.default_rng(seed)
    frames = _mv_frames444(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=seed, chroma_format_idc=3, **kw)
    check(data, 4, 64, 64)


# ---- Weighted prediction -------------------------------------------------

@pytest.mark.parametrize("seed,kw", [
    (61, dict(n_refs=2)),                                  # uni-pred P
    (62, dict(n_refs=2, b_slices=True, sao=True, deblock=True)),
    (63, dict(n_refs=2, b_slices=True, bit_depth=10)),
])
def test_weighted_pred(seed, kw):
    rng = np.random.default_rng(seed)
    frames = _mv_frames444(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=seed, weighted=True, **kw)
    check(data, 4, 64, 64)


def test_weighted_pred_jax_engine():
    rng = np.random.default_rng(66)
    frames = _mv_frames444(64, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=66, n_refs=2, b_slices=True,
                                     sao=True, deblock=True, weighted=True)
    ref = ref_decode(data)
    d = Decoder("jax")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 3
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


# ---- Temporal MVP (TMVP) -------------------------------------------------

@pytest.mark.parametrize("seed,kw", [
    (71, dict(n_refs=1)),
    (72, dict(n_refs=2)),
    (73, dict(n_refs=2, b_slices=True, sao=True, deblock=True)),
    (74, dict(n_refs=2, b_slices=True, weighted=True, sao=True,
              deblock=True)),
    (75, dict(n_refs=2, b_slices=True, chroma_format_idc=3)),
])
def test_tmvp(seed, kw):
    rng = np.random.default_rng(seed)
    frames = _mv_frames444(64, 64, 5, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=seed, tmvp=True, **kw)
    check(data, 5, 64, 64)


def test_tmvp_candidate_is_live():
    """Killing the temporal derivation must diverge the decode (guards
    against the TMVP path being silently unused by the generator)."""
    import openhevc_tpu.bitstream.mvs as MV
    rng = np.random.default_rng(73)
    frames = _mv_frames444(64, 64, 5, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=73, n_refs=2, b_slices=True,
                                     sao=True, deblock=True, tmvp=True)
    ref = ref_decode(data)
    orig = MV.MotionContext.temporal_mv
    MV.MotionContext.temporal_mv = lambda self, *a: (0, (0, 0))
    try:
        # the sabotage targets the Python derivation; the native core
        # computes TMVP in C++ (its liveness is asserted by
        # test_native_coverage.py), so pin the Python parser here
        d = Decoder("np", native_parse=False)
        mine = d.decode(data) + d.flush()
    finally:
        MV.MotionContext.temporal_mv = orig
    diff = sum(int(not np.array_equal(mine[i].cropped()[0],
                                      np.asarray(ref_planes(f)[0])))
               for i, f in enumerate(ref))
    assert diff > 0


# ---- AMP (asymmetric motion partitions) ----------------------------------

@pytest.mark.parametrize("seed,kw", [
    (81, dict(n_refs=1)),
    (82, dict(n_refs=2, b_slices=True, sao=True, deblock=True, tmvp=True)),
    (83, dict(n_refs=2, b_slices=True, tmvp=True)),
    (84, dict(n_refs=2, b_slices=True, tmvp=True)),  # covers nLx2N+nRx2N
])
def test_amp(seed, kw):
    rng = np.random.default_rng(seed)
    base = [rng.integers(0, 256, (128, 128)).astype(np.uint8)
            for _ in range(3)]
    n = 6 if seed >= 83 else 5
    frames = [tuple(b[dy:dy + 64, dx:dx + 64].copy() for b in base)
              for dx, dy in [(int(rng.integers(0, 32)),
                              int(rng.integers(0, 32))) for _ in range(n)]]
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=5,
                                     min_cb_log2=3, seed=seed, amp=True,
                                     **kw)
    check(data, n, 64, 64)


# ---- Range extension: 4:2:2 chroma ---------------------------------------

def frames422(W, H, n, rng, maxval=256):
    dt = np.uint16 if maxval > 256 else np.uint8
    return [(rng.integers(0, maxval, (H, W)).astype(dt),
             rng.integers(0, maxval, (H, W // 2)).astype(dt),
             rng.integers(0, maxval, (H, W // 2)).astype(dt))
            for _ in range(n)]


@pytest.mark.parametrize("seed,kw", [
    (11, dict(qp=26, min_cb_log2=3)),                    # NxN
    (12, dict(qp=34, W=96, ctb_log2=5, min_cb_log2=3)),  # TU splits + pairs
    (13, dict(qp=30, min_cb_log2=3, sao=True, deblock=True)),
    (14, dict(qp=30, min_cb_log2=3, bit_depth=10)),
    (15, dict(qp=30, min_cb_log2=3, transform_skip=True)),
    (16, dict(qp=30, min_cb_log2=3, transquant_bypass=True)),
    (17, dict(qp=30, pcm=True)),
])
def test_rext_422_intra(seed, kw):
    rng = np.random.default_rng(seed)
    W, H = kw.pop("W", 64), kw.pop("H", 64)
    maxval = 1024 if kw.get("bit_depth", 8) == 10 else 256
    frames = frames422(W, H, 2, rng, maxval)
    data, _ = encode_intra_stream(frames, W, H, ctb_log2=kw.pop("ctb_log2", 4),
                                  seed=seed, chroma_format_idc=2, **kw)
    check(data, 2, W, H)


def _mv_frames422(W, H, n, rng):
    base = [rng.integers(0, 256, (H * 2, W * 2)).astype(np.uint8),
            rng.integers(0, 256, (H * 2, W)).astype(np.uint8),
            rng.integers(0, 256, (H * 2, W)).astype(np.uint8)]
    out = []
    for _ in range(n):
        dx = int(rng.integers(0, W // 2))
        dy = int(rng.integers(0, H // 2))
        out.append((base[0][dy:dy + H, dx:dx + W].copy(),
                    base[1][dy:dy + H, dx // 2:dx // 2 + W // 2].copy(),
                    base[2][dy:dy + H, dx // 2:dx // 2 + W // 2].copy()))
    return out


@pytest.mark.parametrize("seed,kw", [
    (21, dict(n_refs=1)),
    (22, dict(n_refs=2, b_slices=True, sao=True, deblock=True, tmvp=True)),
    (23, dict(n_refs=2, b_slices=True, weighted=True)),
])
def test_rext_422_inter(seed, kw):
    rng = np.random.default_rng(seed)
    frames = _mv_frames422(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=seed, chroma_format_idc=2, **kw)
    check(data, 4, 64, 64)


def test_rext_422_jax_engine():
    rng = np.random.default_rng(24)
    frames = _mv_frames422(64, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=24, n_refs=2, b_slices=True,
                                     sao=True, deblock=True,
                                     chroma_format_idc=2)
    ref = ref_decode(data)
    d = Decoder("jax")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 3
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


@pytest.mark.parametrize("rot,rdpcm,rice,ts,tqb,qp", [
    (False, False, True, True, False, 10),   # persistent Rice, low QP
    (True, False, False, True, False, 30),   # TS rotation (4x4 intra)
    (True, True, False, True, False, 28),    # rotation + TS implicit RDPCM
    (False, True, False, False, True, 26),   # lossless implicit RDPCM
    (True, True, True, True, True, 12),      # everything at once
])
def test_rext_tools(rot, rdpcm, rice, ts, tqb, qp):
    """RExt SPS tools: transform-skip rotation (hevc_cabac.c:1877),
    implicit RDPCM with the reference's exact gates (:1868-1892), and
    persistent Rice adaptation (:1716-1786); vs the reference decoder."""
    import numpy as np
    from conftest import make_frames, ref_decode, ref_planes
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    from openhevc_tpu.decoder import Decoder
    rng = np.random.default_rng(141)
    W, H = 64, 64
    frames = make_frames(W, H, 2, rng, smooth=False)
    data, recons = encode_intra_stream(
        frames, W, H, qp=qp, ctb_log2=4, seed=141, transform_skip=ts,
        transquant_bypass=tqb, rext_rotation=rot,
        rext_implicit_rdpcm=rdpcm, rext_persistent_rice=rice)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 2
    for i, f in enumerate(ref):
        for p, (got, want, rec) in enumerate(zip(
                ref_planes(f), mine[i].cropped(), recons[i])):
            assert np.array_equal(np.asarray(got, np.int64), rec), \
                f"reference != encoder recon f{i} p{p}"
            assert np.array_equal(np.asarray(want, np.int64), rec), \
                f"ours != encoder recon f{i} p{p}"


def test_cross_component_prediction():
    """RExt cross-component prediction (4:4:4): per-TU res_scale syntax,
    chroma residual += (scale * luma residual) >> 3, including the
    zero-cbf synthesis path (hevc.c:1295-1362); vs the reference."""
    import numpy as np
    from conftest import make_frames, ref_decode, ref_planes
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    from openhevc_tpu.decoder import Decoder
    rng = np.random.default_rng(151)
    W, H = 64, 64
    frames = [(rng.integers(0, 256, (H, W), dtype=np.uint8),
               rng.integers(0, 256, (H, W), dtype=np.uint8),
               rng.integers(0, 256, (H, W), dtype=np.uint8))
              for _ in range(2)]
    data, recons = encode_intra_stream(frames, W, H, qp=30, ctb_log2=4,
                                       seed=151, chroma_format_idc=3,
                                       cross_component=True)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 2
    for i, f in enumerate(ref):
        for p, (got, want, rec) in enumerate(zip(
                ref_planes(f), mine[i].cropped(), recons[i])):
            assert np.array_equal(np.asarray(got, np.int64), rec), \
                f"reference != encoder recon f{i} p{p}"
            assert np.array_equal(np.asarray(want, np.int64), rec), \
                f"ours != encoder recon f{i} p{p}"


def test_vui_timing_hrd():
    # SPS carries VUI timing info + NAL HRD parameters; decode must be
    # bit-exact (parse is skip-correct; reference: hevc_ps.c:269-343)
    rng = np.random.default_rng(77)
    frames = moving_frames(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=77, vui_timing=True)
    from openhevc_tpu.bitstream import ps as PS
    from openhevc_tpu.bitstream.bits import unescape_rbsp
    # locate the SPS NAL and confirm the timing fields parse
    i = 0
    sps = None
    while i < len(data):
        j = data.find(b"\x00\x00\x01", i + 3)
        nal = data[i:j if j >= 0 else len(data)]
        nal = nal[nal.index(b"\x00\x00\x01") + 3:]
        if (nal[0] >> 1) & 0x3F == 33:
            sps = PS.parse_sps(unescape_rbsp(nal[2:]))
            break
        if j < 0:
            break
        i = j
    assert sps is not None and sps.time_scale == 60000
    assert sps.num_units_in_tick == 1000
    check(data, 2, 64, 64)


def test_chroma_qp_offset_list(rng):
    """PPS RExt chroma QP offset lists end-to-end: encoder emits the
    list + cu_chroma_qp_offset_flag/_idx per chroma QG, decode is
    bit-exact vs the reference oracle (hevc.c:1247-1263)."""
    from conftest import ref_decode, ref_planes, make_frames
    from openhevc_tpu.decoder import Decoder
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 96, 64
    fr = make_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(
        fr, W, H, qp=30, ctb_log2=4, seed=41,
        chroma_qp_offset_list=((3, -2), (-5, 5), (0, 1)),
        sao=True, deblock=True)
    ref = ref_decode(data)
    for engine in ("np", "jax"):
        d = Decoder(engine)
        pics = d.decode(data) + d.flush()
        assert len(pics) == len(ref)
        for i, f in enumerate(ref):
            rp = ref_planes(f)
            for c in range(3):
                assert np.array_equal(
                    np.asarray(pics[i].cropped()[c], np.int64),
                    np.asarray(rp[c], np.int64)), (engine, i, c)


def test_chroma_qp_offset_list_with_cu_qp_delta(rng):
    """chroma offset list + cu_qp_delta together (both QG state
    machines active)."""
    from conftest import ref_decode, ref_planes, make_frames
    from openhevc_tpu.decoder import Decoder
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    W, H = 64, 64
    fr = make_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(
        fr, W, H, qp=30, ctb_log2=4, seed=43,
        chroma_qp_offset_list=((4, -4),), cu_qp_delta_depth=0)
    ref = ref_decode(data)
    d = Decoder("np")
    pics = d.decode(data) + d.flush()
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        for c in range(3):
            assert np.array_equal(
                np.asarray(pics[i].cropped()[c], np.int64),
                np.asarray(rp[c], np.int64)), (i, c)


def test_non_uniform_tiles_native(rng):
    """Non-uniform tile spacing parses through the NATIVE core
    (explicit col/row boundaries; hevc_ps.c:2305-2341 derivation) and
    decodes bit-exact vs the reference oracle."""
    W, H = 160, 96   # 10x6 CTBs at ctb_log2=4
    fr = make_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(fr, W, H, qp=30, ctb_log2=4, seed=51,
                                  tile_cols=3, tile_rows=2,
                                  tile_widths=(5, 2, 3),
                                  tile_heights=(4, 2),
                                  sao=True, deblock=True)
    ref = ref_decode(data)
    d = Decoder("np")
    pics = d.decode(data) + d.flush()
    assert d.stats["python_slices"] == 0, d.stats
    assert d.stats["native_slices"] > 0
    assert len(pics) == len(ref)
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        for c in range(3):
            assert np.array_equal(
                np.asarray(pics[i].cropped()[c], np.int64),
                np.asarray(rp[c], np.int64)), (i, c)


def test_non_uniform_tiles_wpp_parity(rng):
    """Non-uniform tiles with threaded substream parse matches the
    serial path (native threaded-parse invariance)."""
    from openhevc_tpu.decoder import Decoder as D
    W, H = 128, 64
    fr = make_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(fr, W, H, qp=30, ctb_log2=4, seed=52,
                                  tile_cols=2, tile_rows=2,
                                  tile_widths=(3, 5),
                                  tile_heights=(1, 3))
    ref = ref_decode(data)
    d = D("np")
    pics = d.decode(data) + d.flush()
    assert d.stats["python_slices"] == 0, d.stats
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        for c in range(3):
            assert np.array_equal(
                np.asarray(pics[i].cropped()[c], np.int64),
                np.asarray(rp[c], np.int64)), (i, c)


def frames12(W, H, n, rng, chroma_full=False):
    yy, xx = np.mgrid[0:H, 0:W]
    cs = slice(None) if chroma_full else slice(None, None, 2)
    fr = []
    for i in range(n):
        y = ((xx * 32 + yy * 48 + i * 160) % 4096 * 0.7 +
             rng.integers(0, 960, (H, W))).astype(np.uint16)
        u = ((xx[cs, cs] * 16 + 2048) % 4096).astype(np.uint16)
        v = ((yy[cs, cs] * 32) % 4096).astype(np.uint16)
        fr.append((y, u, v))
    return fr


def test_main12_intra():
    """RExt 12-bit (Main 12 profile): decode bit-exact vs the
    reference at qp_bd_offset 24 (hevc.h:460 SPSRext bit-depth range;
    transform shift 20-bd, hevcdsp_template.c:210)."""
    rng = np.random.default_rng(181)
    frames = frames12(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=181, bit_depth=12)
    check(data, 2, 64, 64)


def test_main12_intra_filters():
    """12-bit deblock + SAO: the saturated SAO offsets scale by
    bd-10 (hevc.c sao_offset_val << (bd - min(bd,10)))."""
    rng = np.random.default_rng(182)
    frames = frames12(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=26, ctb_log2=5,
                                  seed=182, bit_depth=12, sao=True,
                                  deblock=True)
    check(data, 2, 64, 64)


def test_main444_12_intra():
    """4:4:4 12-bit (Main 4:4:4 12 profile tier)."""
    rng = np.random.default_rng(183)
    frames = frames12(64, 64, 2, rng, chroma_full=True)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=183, bit_depth=12,
                                  chroma_format_idc=3)
    check(data, 2, 64, 64)


def test_main12_jax_engine():
    """12-bit through the device pipeline (uint16 output planes)."""
    rng = np.random.default_rng(184)
    frames = frames12(64, 64, 2, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                  seed=184, bit_depth=12)
    ref = ref_decode(data)
    d = Decoder("jax")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 2
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(np.asarray(got, np.int64),
                                  np.asarray(want, np.int64)), (i, p)
