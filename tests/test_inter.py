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


def test_lowdelay_constrained_intra():
    """Constrained intra prediction (PPS flag): intra CUs inside P
    pictures may only predict from intra-coded neighbour samples; inter
    neighbours are substituted (8.4.4.2.2); vs the reference decoder."""
    rng = np.random.default_rng(101)
    frames = moving_frames(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=32, ctb_log2=4,
                                     seed=101, constrained_intra=True)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == 4
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_missing_reference_concealment():
    """Dropping a reference picture's NAL mid-stream: both decoders
    fabricate a mid-gray concealment frame (generate_missing_ref,
    hevc_refs.c:538) and continue deterministically."""
    rng = np.random.default_rng(111)
    frames = moving_frames(64, 64, 4, rng)
    data, _ = encode_lowdelay_stream(frames, 64, 64, qp=32, ctb_log2=4,
                                     seed=111, n_refs=1)
    from openhevc_tpu.decoder import split_nals
    nals = split_nals(data)
    # drop the second picture (first P frame); keep VPS/SPS/PPS + others
    vcl = [i for i, n in enumerate(nals) if ((n[0] >> 1) & 0x3F) <= 31]
    keep = [n for i, n in enumerate(nals) if i != vcl[1]]
    patched = b"".join(b"\x00\x00\x01" + n for n in keep)
    ref = ref_decode(patched)
    d = Decoder("np")
    mine = d.decode(patched) + d.flush()
    assert len(ref) == len(mine) == 3
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


def test_rasl_dropped_after_cra():
    """A stream starting at a CRA: RASL pictures that reference
    pre-CRA pictures are dropped, trailing pictures decode
    (max_ra gating, hevc.c:3375-3398)."""
    from openhevc_tpu.encoder.hevc_enc import (EncoderConfig, write_vps,
                                               write_sps, write_pps)
    from openhevc_tpu.encoder.inter_enc import PFrameEncoder
    rng = np.random.default_rng(121)
    W, H = 64, 64
    frames = moving_frames(W, H, 3, rng)
    cfg = EncoderConfig(width=W, height=H, qp=32, ctb_log2=4,
                        min_cb_log2=3, min_tb_log2=2, max_tb_log2=4,
                        max_transform_hierarchy_depth=2, pcm_enabled=False,
                        deblock_disabled=True, max_num_ref=1)
    st_rps = [[-1], [-2]]
    data = write_vps(cfg) + write_sps(cfg, st_rps=st_rps) + write_pps(cfg)
    enc = PFrameEncoder(cfg, rng)
    enc.num_st_rps = len(st_rps)
    enc.is_p = False
    enc._motion_store = {}
    enc._pu_list = []
    enc._parent_chroma = {}
    # CRA intra picture at poc 2 (NAL_CRA = 21)
    data += enc.encode_frame(frames[0][0], frames[0][1], frames[0][2],
                             nal_type=21, poc=2, num_st_rps=len(st_rps))
    cra_recon = [p.copy() for p in enc.recon]
    # RASL_N at poc 1 (leading picture; dropped by both decoders before
    # its slice data is touched, so intra content suffices)
    data += enc.encode_frame(frames[1][0], frames[1][1], frames[1][2],
                             nal_type=8, poc=1, num_st_rps=len(st_rps))
    # TRAIL_R at poc 3 referencing the CRA
    data += enc.encode_frame_p(frames[2][0], frames[2][1], frames[2][2],
                               3, [(2, cra_recon)], nal_type=1)
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(mine) == len(ref) == 2      # RASL dropped by both
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)
