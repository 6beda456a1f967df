"""Device (XLA) whole-frame deblock+SAO vs the reference-exact scalar
schedule (ops/filters_sched.py), including the formerly-gated cases:
PCM / transquant-bypass no-filter blocks (restore_tqb_pixels,
hevc_filter.c:163) and 16x16-CTB SAO chroma halo timing
(deblocking_filter_CTB's x_end -= 8*h deferral).

Runs on CPU: filters_jax is plain XLA (no Pallas), so the device
formulation executes anywhere."""
import numpy as np
import pytest

from openhevc_tpu.decoder import Decoder
from openhevc_tpu.encoder.intra_enc import encode_intra_stream

from conftest import make_frames


def _capture_frames(data):
    """Decode with the np engine, capturing (pre-filter planes, fs) for
    every picture plus the schedule-exact filtered truth."""
    import openhevc_tpu.models.recon_np as R
    from openhevc_tpu.ops.filters_sched import apply_loop_filters as sched
    captured = []
    orig = R.apply_loop_filters

    def spy(planes, fs):
        pre = [np.array(p, np.int64) for p in planes]
        out = sched(planes, fs)
        captured.append((pre, fs, [np.array(p) for p in out]))
        return out

    R.apply_loop_filters = spy
    try:
        d = Decoder("np")
        d.decode(data)
        d.flush()
    finally:
        R.apply_loop_filters = orig
    assert captured
    return captured


def _device_filter(pre, fs):
    import jax.numpy as jnp
    from openhevc_tpu.ops.filters_jax import (apply_filters_device,
                                              device_filters_ok,
                                              prep_filters)
    assert device_filters_ok(fs)
    pff = prep_filters(fs)
    assert pff is not None
    from openhevc_tpu.ops.filters_jax import fargs_arrays
    fargs = tuple(jnp.asarray(a) for a in fargs_arrays(pff))
    y, cb, cr = (jnp.asarray(np.asarray(p, np.int32)) for p in pre)
    sps = fs.sps
    yo, cbo, cro = apply_filters_device(
        y, cb, cr, *fargs, bd=sps.bit_depth, bdc=sps.bit_depth_chroma,
        cs=1 << sps.log2_ctb,
        do_deblock=pff["do_deblock"], do_sao=pff["do_sao"],
        hs=sps.hshift1, vs=sps.vshift1)
    return [np.asarray(yo), np.asarray(cbo), np.asarray(cro)]


@pytest.mark.parametrize("W,H,ctb,seed,pcm,tqb,sao,dbk", [
    (64, 64, 5, 1, False, False, True, True),    # baseline (already ok)
    (64, 64, 4, 2, False, False, True, True),    # 16x16 CTB halo quirk
    (96, 64, 4, 3, False, False, True, True),    # non-square, ctb16
    (64, 64, 5, 4, True, False, True, True),     # PCM no-filter blocks
    (64, 64, 5, 5, False, True, True, True),     # transquant bypass
    (64, 64, 4, 6, True, True, True, True),      # everything at once
    (64, 64, 4, 7, True, False, False, True),    # deblock-only + pcm
    (64, 64, 4, 8, True, False, True, False),    # sao-only + pcm
])
def test_device_filters_match_schedule(W, H, ctb, seed, pcm, tqb,
                                       sao, dbk):
    rng = np.random.default_rng(seed)
    frames = make_frames(W, H, 2, rng, smooth=False)
    kw = dict(qp=34, ctb_log2=ctb, seed=seed, pcm=pcm, sao=sao,
              deblock=dbk)
    if tqb:
        kw["transquant_bypass"] = True
    data, _ = encode_intra_stream(frames, W, H, **kw)
    for pre, fs, truth in _capture_frames(data):
        got = _device_filter(pre, fs)
        for c in range(3):
            assert np.array_equal(got[c].astype(np.int64), truth[c]), \
                (c, np.argwhere(got[c].astype(np.int64) != truth[c])[:5])


# ---- chroma-format-generic device filters (4:2:2 / 4:4:4) ----------------
# hevc_filter.c:345's chroma edge spacing is 8*h / 8*v luma samples; the
# device formulation generalizes via the hs/vs shifts.

def _frames_fmt(W, H, n, rng, fmt):
    cw = W if fmt == 3 else W // 2
    ch = H if fmt >= 2 else H // 2
    return [(rng.integers(0, 256, (H, W)).astype(np.uint8),
             rng.integers(0, 256, (ch, cw)).astype(np.uint8),
             rng.integers(0, 256, (ch, cw)).astype(np.uint8))
            for _ in range(n)]


@pytest.mark.parametrize("fmt,W,H,ctb,seed,pcm,tqb,sao,dbk", [
    (2, 64, 64, 5, 31, False, False, True, True),   # 4:2:2 baseline
    (2, 96, 64, 5, 32, True, False, True, True),    # 4:2:2 + PCM
    (2, 64, 64, 5, 33, False, True, True, True),    # 4:2:2 + tqb
    (2, 64, 64, 5, 34, False, False, False, True),  # 4:2:2 deblock only
    (3, 64, 64, 5, 35, False, False, True, True),   # 4:4:4 baseline
    (3, 96, 64, 5, 36, True, False, True, True),    # 4:4:4 + PCM
    (3, 64, 64, 5, 37, False, True, True, True),    # 4:4:4 + tqb
    (3, 64, 64, 5, 38, False, False, True, False),  # 4:4:4 SAO only
    (2, 64, 64, 4, 39, False, False, False, True),  # 4:2:2 ctb16 dbk-only
    (2, 64, 64, 4, 40, False, False, True, True),   # 4:2:2 ctb16 + SAO
    (3, 96, 64, 4, 41, False, False, True, True),   # 4:4:4 ctb16 + SAO
    (2, 96, 64, 4, 42, True, False, True, True),    # 4:2:2 ctb16+SAO+PCM
])
def test_device_filters_chroma_formats(fmt, W, H, ctb, seed, pcm, tqb,
                                       sao, dbk):
    rng = np.random.default_rng(seed)
    frames = _frames_fmt(W, H, 2, rng, fmt)
    kw = dict(qp=34, ctb_log2=ctb, seed=seed, pcm=pcm, sao=sao,
              deblock=dbk, chroma_format_idc=fmt, min_cb_log2=3)
    if tqb:
        kw["transquant_bypass"] = True
    data, _ = encode_intra_stream(frames, W, H, **kw)
    for pre, fs, truth in _capture_frames(data):
        got = _device_filter(pre, fs)
        for c in range(3):
            assert np.array_equal(got[c].astype(np.int64), truth[c]), \
                (c, np.argwhere(got[c].astype(np.int64) != truth[c])[:5])


def test_device_filters_ok_unconditional():
    """The CTB-16 + non-4:2:0 + SAO carve-out is closed: the stale-halo
    simulation is chroma-format-generic, so device filtering is
    available for every supported format."""
    from openhevc_tpu.ops.filters_jax import device_filters_ok
    rng = np.random.default_rng(40)
    frames = _frames_fmt(64, 64, 1, rng, 2)
    data, _ = encode_intra_stream(frames, 64, 64, qp=34, ctb_log2=4,
                                  seed=40, sao=True, deblock=True,
                                  chroma_format_idc=2, min_cb_log2=3)
    for pre, fs, _truth in _capture_frames(data):
        assert device_filters_ok(fs)
