"""End-to-end conformance: encoder-generated streams must decode bit-exact
in BOTH the reference decoder (golden oracle) and openhevc_tpu.

This is the framework's analogue of the JCT-VC conformance suite
(SURVEY.md §4): the reference repo ships no bitstreams, so we generate our
own per-profile streams and cross-check three ways:
  encoder closed-loop recon == reference decode == openhevc_tpu decode.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import make_frames, ref_decode, ref_planes

from openhevc_tpu.encoder.hevc_enc import encode_pcm_stream
from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.decoder import Decoder


def check_stream(data, recons, W, H):
    ref = ref_decode(data)
    assert len(ref) == len(recons)
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(ref_planes(f), recons[i])):
            assert np.array_equal(got, want), \
                f"reference decode mismatch frame {i} plane {p}"
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(mine) == len(recons)
    for i, pic in enumerate(mine):
        for p, (got, want) in enumerate(zip(pic.cropped(), recons[i])):
            assert np.array_equal(got, want), \
                f"openhevc_tpu decode mismatch frame {i} plane {p}"


def test_pcm_stream(rng):
    W, H = 64, 48
    frames = make_frames(W, H, 2, rng, smooth=False)
    data = encode_pcm_stream(frames, W, H)
    recons = [[f[0].astype(np.int64), f[1].astype(np.int64),
               f[2].astype(np.int64)] for f in frames]
    check_stream(data, recons, W, H)


@pytest.mark.parametrize("W,H,qp,ctb,seed,pcm", [
    (64, 64, 30, 4, 1, False),
    (64, 64, 10, 5, 2, False),
    (128, 64, 37, 6, 3, False),     # CTB 64 -> DCT-32 path
    (64, 64, 26, 4, 4, True),       # PCM CUs interleaved with coded CUs
    (96, 48, 45, 5, 5, False),      # high QP, non-square
])
def test_intra_stream(W, H, qp, ctb, seed, pcm):
    rng = np.random.default_rng(seed)
    frames = make_frames(W, H, 2, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=qp, ctb_log2=ctb,
                                       seed=seed, pcm=pcm)
    check_stream(data, recons, W, H)


@pytest.mark.parametrize("mode,qp,ctb", [
    ("default", 30, 5),     # enabled, default matrices (Table 7-5/7-6)
    ("sps", 30, 6),         # explicit SPS lists; 32x32 TBs hit sl_dc + rep
    ("pps", 37, 5),         # PPS override of SPS-enabled defaults
])
def test_intra_scaling_list(mode, qp, ctb):
    """Dequant scaling matrices (7.3.4 / hevc_cabac.c:1484-1491,1819-1832):
    default, explicit-DPCM, pred-from-ref and PPS-override paths, verified
    bit-exact against the reference decoder."""
    rng = np.random.default_rng(11)
    W, H = 96, 64
    frames = make_frames(W, H, 2, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=qp, ctb_log2=ctb,
                                       seed=11, scaling_list=mode)
    check_stream(data, recons, W, H)


@pytest.mark.parametrize("num_slices,dependent", [
    (2, False),     # two independent slices
    (4, False),     # four slices, boundaries mid-row
    (3, True),      # one independent + two dependent slice segments
])
def test_intra_multi_slice(num_slices, dependent):
    """Multiple slice segments per picture (7.3.6.1): slice-boundary
    in-picture-prediction gating, per-segment CABAC (fresh for
    independent, resumed for dependent segments), decoder accumulation
    of segments; bit-exact vs the reference decoder."""
    rng = np.random.default_rng(41)
    W, H = 96, 80
    frames = make_frames(W, H, 2, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=31, ctb_log2=4,
                                       seed=41, num_slices=num_slices,
                                       dependent_slices=dependent)
    check_stream(data, recons, W, H)


@pytest.mark.parametrize("depth,ctb,qp", [
    (0, 4, 30),     # QG == CTB
    (1, 5, 34),     # QG = half CTB (multiple CUs per QG)
    (2, 5, 26),     # QG = quarter CTB
])
def test_intra_cu_qp_delta(depth, ctb, qp):
    """Per-CU QP: quantization groups, cu_qp_delta_abs/sign coding at the
    first coded TU, QP prediction from left/above QGs + decode order
    (get_qPy_pred, hevc_filter.c:91), bit-exact vs the reference."""
    rng = np.random.default_rng(71)
    W, H = 96, 64
    frames = make_frames(W, H, 2, rng)
    data, recons = encode_intra_stream(frames, W, H, qp=qp, ctb_log2=ctb,
                                       seed=71, cu_qp_delta_depth=depth)
    check_stream(data, recons, W, H)
