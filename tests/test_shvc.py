"""SHVC 2-layer decode vs the reference (scalable openHEVC's flagship
feature): BL + EL with inter-layer sample prediction from the upsampled
BL picture, across x2 / x1.5 / SNR scalability ratios."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import ref_decode, ref_planes

from openhevc_tpu.encoder.shvc_enc import encode_shvc_stream
from openhevc_tpu.decoder import ShvcDecoder


def _frames(w, h, n, rng):
    return [tuple([rng.integers(0, 256, (h, w)).astype(np.uint8),
                   rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                   rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)])
            for _ in range(n)]


def _check(bl_size, el_size, seed, n=4, engine="np", **kw):
    rng = np.random.default_rng(seed)
    blf = _frames(*bl_size, n, rng)
    elf = _frames(*el_size, n, rng)
    data, recons = encode_shvc_stream(blf, elf, bl_size, el_size,
                                      qp=30, seed=seed, **kw)
    ref = ref_decode(data)
    d = ShvcDecoder(engine)
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == n
    for i in range(n):
        for p, (got, want) in enumerate(zip(mine[i].cropped(), recons[i])):
            assert np.array_equal(got, np.asarray(want)), ("self", i, p)
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, np.asarray(want)), ("ref", i, p)


@pytest.mark.parametrize("seed,bl,el,kw", [
    (31, (32, 32), (64, 64), {}),                      # x2 spatial
    (41, (32, 32), (48, 48), {}),                      # x1.5 spatial
    (42, (48, 48), (48, 48), {}),                      # SNR (quality)
    (43, (48, 32), (96, 64), dict(ctb_log2=5)),        # x2 rectangular
])
def test_shvc_2layer(seed, bl, el, kw):
    _check(bl, el, seed, **kw)


def test_shvc_jax_engine():
    _check((32, 32), (64, 64), 51, n=3, engine="jax")


def test_shvc_vps_roundtrip():
    """My parser consumes the SHVC VPS extension + EL SPS it writes."""
    from openhevc_tpu.encoder.hevc_enc import EncoderConfig
    from openhevc_tpu.encoder.shvc_enc import write_vps_shvc, write_sps_el
    from openhevc_tpu.bitstream import ps as PS
    from openhevc_tpu.bitstream.bits import unescape_rbsp
    from openhevc_tpu.decoder import split_nals
    bl = EncoderConfig(width=32, height=32, pcm_enabled=False)
    el = EncoderConfig(width=64, height=64, pcm_enabled=False)
    vnal = split_nals(write_vps_shvc(bl, el))[0]
    v = PS.parse_vps(unescape_rbsp(vnal[2:]))
    assert v.max_layers == 2
    assert v.num_direct_ref_layers == (0, 1)
    assert v.rep_formats == ((32, 32, 1, 8), (64, 64, 1, 8))
    snal = split_nals(write_sps_el(el))[0]
    s = PS.parse_sps(unescape_rbsp(snal[2:]), layer_id=1, vps=v)
    assert (s.width, s.height, s.sps_id) == (64, 64, 1)


# ---- inter-layer motion prediction (mfm) + mixed EL reference lists -----

@pytest.mark.parametrize("seed,kw", [
    (51, dict(bl_inter=True)),                       # real BL motion
    (52, dict(bl_inter=True, el_temporal=True)),     # ST + IL mixed L0
    (53, dict(bl_inter=True, el_temporal=True,       # fractional MC on
              nonzero_il_mv=True)),                  # the IL picture
    (54, dict(bl_inter=True, el_temporal=True, el_tmvp=True)),
    (55, dict(bl_inter=True, el_temporal=True, el_tmvp=True,
              col_il=True)),                         # TMVP col = IL ref
    (56, dict(bl_inter=True, el_temporal=True, el_tmvp=True,
              col_il=True, nonzero_il_mv=True)),
])
def test_shvc_il_motion(seed, kw):
    """EL temporal+IL mixed lists, nonzero MVs on the IL picture and
    TMVP with collocated = IL whose motion is the upsampled BL field
    (mfm; ff_upscale_mv_block hevc_filter.c:1311, EL cand order
    hevc_refs.c:657). All bit-exact vs the reference decoder."""
    _check((32, 32), (64, 64), seed, n=5, **kw)


def test_shvc_il_motion_x15_snr():
    _check((32, 32), (48, 48), 57, n=4, bl_inter=True, el_temporal=True,
           el_tmvp=True, col_il=True, nonzero_il_mv=True)
    _check((48, 48), (48, 48), 58, n=4, bl_inter=True, el_temporal=True,
           el_tmvp=True, col_il=True, nonzero_il_mv=True)


def test_shvc_il_motion_is_live():
    """Zeroing the upscaled IL motion field must diverge a col_il
    stream (guards against TMVP never consuming the mfm field)."""
    import openhevc_tpu.ops.upsample_np as U
    rng = np.random.default_rng(59)
    blf = _frames(32, 32, 5, rng)
    elf = _frames(64, 64, 5, rng)
    data, recons = encode_shvc_stream(blf, elf, (32, 32), (64, 64),
                                      qp=30, seed=59, bl_inter=True,
                                      el_temporal=True, el_tmvp=True,
                                      col_il=True)
    orig = U.upscale_mv_field
    U.upscale_mv_field = lambda *a, **k: tuple(
        np.zeros_like(x) for x in orig(*a, **k))
    try:
        d = ShvcDecoder("np")
        mine = d.decode(data) + d.flush()
    finally:
        U.upscale_mv_field = orig
    diff = sum(int(not np.array_equal(np.asarray(mine[i].cropped()[0]),
                                      np.asarray(recons[i][0])))
               for i in range(len(recons)))
    assert diff > 0


def test_shvc_el_waves_mesh():
    """EL pictures batch into multi-picture mesh waves (the
    pthread_frame.c:516-624 concurrent-layer analogue): the IL
    reference is a same-AU planes object, never a wave member, so it
    must not serialize the wave. Asserts bit-exactness vs the
    sequential decode AND that at least one EL wave held >= 2
    pictures."""
    import jax
    from jax.sharding import Mesh
    from openhevc_tpu.config import DecoderConfig
    from openhevc_tpu.parallel.mesh import MeshFrameDecoder

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs virtual CPU devices")
    rng = np.random.default_rng(61)
    n = 6
    blf = _frames(32, 32, n, rng)
    elf = _frames(64, 64, n, rng)
    data, recons = encode_shvc_stream(blf, elf, (32, 32), (64, 64),
                                      qp=30, seed=61)
    wave_sizes = []
    orig = MeshFrameDecoder.reconstruct_wave

    def spy(self, fs_list, refs_list=None):
        wave_sizes.append(len(fs_list))
        return orig(self, fs_list, refs_list)

    MeshFrameDecoder.reconstruct_wave = spy
    try:
        mesh = Mesh(np.array(devs[:4]), ("frame",))
        cfg = DecoderConfig.from_env(engine="jax", mesh=mesh)
        d = ShvcDecoder("jax", config=cfg)
        mine = d.decode(data) + d.flush()
    finally:
        MeshFrameDecoder.reconstruct_wave = orig
    ref = ShvcDecoder("np")
    want = ref.decode(data) + ref.flush()
    assert len(mine) == len(want) == n
    for i in range(n):
        for p in range(3):
            assert np.array_equal(
                np.asarray(mine[i].cropped()[p], np.int64),
                np.asarray(want[i].cropped()[p], np.int64)), (i, p)
    assert max(wave_sizes, default=0) >= 2, wave_sizes
