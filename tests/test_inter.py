"""Inter (P-slice) conformance vs the reference decoder.

Low-delay IDR+P streams exercising skip / merge / AMVP, multi-ref,
fractional-pel MC, inter TU trees, intra CUs in P slices, and loop filters
over inter frames (filtered reference pictures)."""
import numpy as np
import pytest

from conftest import ref_decode, ref_planes

from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
from openhevc_tpu.decoder import Decoder


def moving_frames(W, H, n, rng):
    yy, xx = np.mgrid[0:H, 0:W]
    base = ((xx * 2 + yy * 3) % 256).astype(np.int64)
    fr = []
    for i in range(n):
        y = np.clip(base + rng.integers(-20, 20, (H, W)) + i * 2,
                    0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] + i * 5 + 128) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] * 2 + i * 3) % 256).astype(np.uint8)
        fr.append((y, u, v))
    return fr


@pytest.mark.parametrize("W,H,qp,ctb,seed,nref,sao,dbk,mm", [
    (64, 64, 32, 4, 1, 1, False, False, 5),   # basic P
    (64, 64, 32, 4, 2, 2, False, False, 5),   # multi-ref
    (96, 64, 28, 5, 3, 1, True, True, 5),     # filters on P frames
    (64, 64, 35, 4, 4, 2, True, True, 3),     # all combined, max_merge 3
])
def test_lowdelay_p(W, H, qp, ctb, seed, nref, sao, dbk, mm):
    rng = np.random.default_rng(seed)
    frames = moving_frames(W, H, 4, rng)
    data, _ = encode_lowdelay_stream(frames, W, H, qp=qp, ctb_log2=ctb,
                                     seed=seed, n_refs=nref, sao=sao,
                                     deblock=dbk, max_merge=mm)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 4
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_lowdelay_scaling_list():
    """Inter matrix ids (3 + c_idx, hevc_cabac.c:1487-1489) through P
    slices, vs the reference decoder."""
    rng = np.random.default_rng(31)
    frames = moving_frames(64, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=33, ctb_log2=5,
                                     seed=31, scaling_list="sps")
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 3
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


@pytest.mark.parametrize("num_slices,dependent", [(2, False), (3, True)])
def test_lowdelay_multi_slice(num_slices, dependent):
    """Multi-slice P pictures: merge/AMVP neighbour gating at slice
    boundaries (6.4.1), per-segment CABAC; vs the reference decoder."""
    rng = np.random.default_rng(51)
    frames = moving_frames(64, 64, 3, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=32, ctb_log2=4,
                                     seed=51, num_slices=num_slices,
                                     dependent_slices=dependent)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 3
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_lowdelay_long_term_ref():
    """Long-term reference pictures: slice-header LT list (poc_lsb
    matching, decode_lt_rps), LT_CURR list order after ST refs, and
    unscaled AMVP/merge MV handling for LT refs; vs the reference."""
    rng = np.random.default_rng(61)
    frames = moving_frames(64, 64, 5, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=32, ctb_log2=4,
                                     seed=61, n_refs=1, lt_ref=True)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 5
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)
