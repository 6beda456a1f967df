"""JAX/TPU reconstruction pipeline vs numpy oracle and encoder recon."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import make_frames

from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.decoder import Decoder


@pytest.mark.parametrize("W,H,qp,ctb,seed,pcm", [
    (64, 64, 30, 4, 1, False),
    (128, 64, 37, 6, 3, False),     # DCT-32
    (64, 64, 26, 4, 4, True),       # PCM prefill + intra scan interleave
])
def test_jax_engine_bit_exact(W, H, qp, ctb, seed, pcm):
    rng = np.random.default_rng(seed)
    frames = make_frames(W, H, 2, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=qp, ctb_log2=ctb,
                                       seed=seed, pcm=pcm)
    d = Decoder("jax")
    pics = d.decode(data) + d.flush()
    assert len(pics) == len(recons)
    for i, pic in enumerate(pics):
        for p, (got, want) in enumerate(zip(pic.cropped(), recons[i])):
            assert np.array_equal(got, want), (i, p)


def test_residual_kernels_match_numpy(rng):
    import math
    from openhevc_tpu.ops import transforms_np as T
    from openhevc_tpu.ops.idct import residual_bucket
    import jax.numpy as jnp
    for s in (4, 8, 16, 32):
        n = 24
        log2s = int(math.log2(s))
        levels = rng.integers(-100, 100, (n, s, s)).astype(np.int32)
        qp = rng.integers(0, 52, n).astype(np.int32)
        is_dst = (rng.random(n) < 0.5) & (s == 4)
        r = residual_bucket(jnp.asarray(levels), jnp.asarray(qp),
                            jnp.asarray(is_dst),
                            jnp.zeros(n, bool), jnp.zeros(n, bool),
                            jnp.zeros(n, bool), jnp.zeros(n, bool),
                            s=s, bit_depth=8)
        r = np.asarray(r)
        for i in range(n):
            d = T.dequant(levels[i], log2s, int(qp[i]), 8)
            want = T.inverse_transform(d, 8, is_dst=bool(is_dst[i]))
            assert np.array_equal(r[i], want), (s, i)


def test_jax_engine_inter():
    from conftest import ref_decode, ref_planes
    from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
    from test_inter import moving_frames
    rng = np.random.default_rng(3)
    frames = moving_frames(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=30, ctb_log2=4,
                                     seed=3, n_refs=2, b_slices=True,
                                     sao=True, deblock=True)
    ref = ref_decode(data)
    d = Decoder("jax")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 4
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_upsample_jax_matches_numpy(rng):
    from openhevc_tpu.ops.upsample_np import upsample_plane, scale_add
    from openhevc_tpu.ops.upsample import upsample_plane_jax
    for (bw, bh, ew, eh, luma) in [(48, 32, 96, 64, True),
                                   (48, 32, 72, 48, True),
                                   (24, 16, 48, 32, False),
                                   (30, 20, 67, 45, True)]:
        bl = rng.integers(0, 256, (bh, bw))
        sx, ax = scale_add(bw, ew)
        sy, ay = scale_add(bh, eh)
        a = upsample_plane(bl, ew, eh, sx, ax, sy, ay, luma=luma)
        b = upsample_plane_jax(bl, ew, eh, sx, ax, sy, ay, luma=luma)
        assert np.array_equal(a, b), (bw, bh, ew, eh)


def test_jax_engine_scaling_list():
    """Scaling matrices through the jitted residual path (sm operand of
    residual_bucket), vs encoder closed-loop recon."""
    rng = np.random.default_rng(21)
    frames = make_frames(96, 64, 2, rng)
    data, recons = encode_intra_stream(frames, 96, 64, qp=31, ctb_log2=6,
                                       seed=21, scaling_list="sps")
    d = Decoder("jax")
    pics = d.decode(data) + d.flush()
    assert len(pics) == len(recons)
    for i, pic in enumerate(pics):
        for p, (got, want) in enumerate(zip(pic.cropped(), recons[i])):
            assert np.array_equal(got, want), (i, p)


def test_jax_device_filters():
    """Deblock+SAO on device (ops/filters_jax.py): jax-engine decode of a
    filtered stream (CTB 32, cu_qp_delta QP map) equals the reference."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import ref_decode, ref_planes
    rng = np.random.default_rng(91)
    W, H = 128, 96
    frames = make_frames(W, H, 3, rng)
    data, _ = encode_intra_stream(frames, W, H, qp=34, ctb_log2=5, seed=91,
                                  deblock=True, sao=True,
                                  cu_qp_delta_depth=1)
    ref = ref_decode(data)
    d = Decoder("jax")
    # confirm the device filter path actually engages
    from openhevc_tpu.models import pipeline as P
    used = []
    orig = P.JaxEngine._run_fused
    def spy(self, fs, rp):
        lp = orig(self, fs, rp)
        used.append(lp.device_filtered)
        return lp
    P.JaxEngine._run_fused = spy
    try:
        mine = d.decode(data) + d.flush()
    finally:
        P.JaxEngine._run_fused = orig
    assert used and all(used), "device filter path did not engage"
    assert len(ref) == len(mine) == 3
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_jax_engine_cclm_stream():
    """Cross-component-prediction streams route through the scalar
    recon (the device residual assembly lacks the luma->chroma
    coupling); output must stay bit-exact vs the reference."""
    import numpy as np
    from conftest import ref_decode, ref_planes
    from openhevc_tpu.decoder import Decoder
    from openhevc_tpu.encoder.intra_enc import encode_intra_stream
    rng = np.random.default_rng(66)
    yy, xx = np.mgrid[0:64, 0:64]
    frames = [((((xx * 2 + yy * 3 + i * 10) % 256) * 0.7 +
                rng.integers(0, 60, (64, 64))).astype(np.uint8),
               ((xx + i * 7 + 128) % 256).astype(np.uint8),
               ((yy * 2 + i * 3) % 256).astype(np.uint8))
              for i in range(2)]
    data, _ = encode_intra_stream(frames, 64, 64, qp=32, seed=66,
                                  chroma_format_idc=3,
                                  cross_component=True)
    ref = ref_decode(data)
    d = Decoder("jax")
    pics = d.decode(data) + d.flush()
    for i, f in enumerate(ref):
        rp = ref_planes(f)
        for c in range(3):
            assert np.array_equal(
                np.asarray(pics[i].cropped()[c], np.int64),
                np.asarray(rp[c], np.int64)), (i, c)


def _capture_inter_jobs(data):
    """Decode with the jax engine on CPU, capturing every inter picture's
    (fs, ref_planes) reconstruction inputs."""
    from openhevc_tpu.models.pipeline import JaxEngine
    jobs = []
    orig = JaxEngine.reconstruct

    def spy(self, fs, ref_planes=None):
        if fs.inter_pbs:
            jobs.append((fs, dict(ref_planes or {})))
        return orig(self, fs, ref_planes=ref_planes)

    JaxEngine.reconstruct = spy
    try:
        d = Decoder("jax")
        d.decode(data)
        d.flush()
    finally:
        JaxEngine.reconstruct = orig
    assert jobs
    return jobs


@pytest.mark.parametrize("weighted", [False, True])
def test_inter_prefill_matches_legacy_path(weighted):
    """The all-device inter prefill (_inter_prefill: arena residual +
    two-stage MC + combine, used by the fused TPU path) must equal the
    legacy packed path (_run_inter_only) on the same picture."""
    import jax.numpy as jnp
    from test_inter import moving_frames
    from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
    from openhevc_tpu.models.pipeline import (
        JaxEngine, _inter_prefill, _pack_arena, _res_buckets, pack_frame)
    from openhevc_tpu.ops.intra_fused import padded_dims, OY, OX
    rng = np.random.default_rng(7)
    frames = moving_frames(96, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 96, 64, qp=30, ctb_log2=4,
                                     seed=7, n_refs=2, b_slices=True,
                                     weighted=weighted)
    for fs, refs in _capture_inter_jobs(data):
        eng = JaxEngine()
        inter = eng._pack_inter(fs, refs)
        assert inter["hf"][0] is not None
        npk = fs.native_pack
        if npk is not None:
            arena4, arena16, escs, caps = (npk["arena4"], npk["arena16"],
                                           npk["esc"], npk["caps"])
        else:
            arena4, arena16, escs, caps = _pack_arena(_res_buckets(fs))
        sps = fs.sps
        H, W = sps.height, sps.width
        Hc, Wc = H >> sps.vshift1, W >> sps.hshift1
        hl, wl = padded_dims(H, W)
        hc, wc = padded_dims(Hc, Wc)
        wt = inter.get("wt")
        wt_dev = None
        denoms = None
        if wt is not None:
            wt_dev = (jnp.asarray(wt["wg"]), jnp.asarray(wt["og"]))
            denoms = tuple(wt["denoms"])
        if weighted:
            assert wt is not None, "expected weighted-pred stream"
        md = inter["md"]
        luma, chroma = _inter_prefill(
            jnp.asarray(arena4), jnp.asarray(arena16), jnp.asarray(escs),
            jnp.asarray(md["idx"]), jnp.asarray(md["vals"]),
            inter["hf"][0], inter["hf"][1], inter["hf"][2],
            wt=wt_dev, caps=caps, H=H, W=W, Hc=Hc, Wc=Wc,
            hl=hl, wl=wl, hc=hc, wc=wc, bd=sps.bit_depth,
            hs=sps.hshift1, vs=sps.vshift1,
            h4=md["h4"], w4=md["w4"], denoms=denoms,
            pairs=inter.get("pairs", False))
        pf = pack_frame(fs)
        pf.inter = inter
        planes4 = np.asarray(eng._run_inter_only(pf))
        # legacy path leaves intra pixels at planes0 (zeros here); the
        # prefill leaves them 0 too -> direct equality on the crop
        got_y = np.asarray(luma)[OY:OY + H, OX:OX + W]
        got_cb = np.asarray(chroma)[0, OY:OY + Hc, OX:OX + Wc]
        got_cr = np.asarray(chroma)[1, OY:OY + Hc, OX:OX + Wc]
        assert np.array_equal(got_y, planes4[0, :H, :W])
        assert np.array_equal(got_cb, planes4[1, :Hc, :Wc])
        assert np.array_equal(got_cr, planes4[2, :Hc, :Wc])
