"""Mesh-sharded wave decode (openhevc_tpu/parallel/): independent
pictures reconstruct as ONE batched dispatch sharded over the `frame`
axis of an 8-virtual-device CPU mesh, bit-identical to the sequential
np-engine decode (which is itself oracle-checked elsewhere)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openhevc_tpu.decoder import Decoder
from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.encoder.inter_enc import encode_ra_stream

from conftest import make_frames


def _mesh(n=8):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(np.array(devs[:n]), ("frame",))


def _compare(data, n):
    ref = Decoder("np")
    want = [p.cropped() for p in (ref.decode(data) + ref.flush())]
    d = Decoder("jax", mesh=_mesh())
    got = [p.cropped() for p in (d.decode(data) + d.flush())]
    assert len(got) == len(want) == n
    for i in range(n):
        for c in range(3):
            assert np.array_equal(np.asarray(got[i][c], np.int64),
                                  np.asarray(want[i][c], np.int64)), (i, c)
    return d


def test_wave_intra_stream():
    """16 intra pictures over an 8-device mesh: two full waves."""
    rng = np.random.default_rng(21)
    frames = make_frames(64, 64, 16, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, seed=21)
    d = _compare(data, 16)
    assert not d._wave_sched or len(d._wave_sched) == 0   # flushed


def test_wave_intra_filters_pcm():
    """Waves with device in-loop filters + PCM no-filter blocks."""
    rng = np.random.default_rng(22)
    frames = make_frames(64, 64, 9, rng, smooth=False)
    data, _ = encode_intra_stream(frames, 64, 64, qp=34, ctb_log2=4,
                                  seed=22, pcm=True, sao=True,
                                  deblock=True)
    _compare(data, 9)


def test_wave_mixed_ra_stream():
    """RA pyramid: INTER pictures batch into waves too (the
    pthread_frame.c:325 analogue) — same-level hierarchical-B pictures
    are mutually independent. Assert multi-picture inter waves actually
    form, with output order and bit-exactness preserved."""
    from openhevc_tpu.parallel import MeshFrameDecoder
    rng = np.random.default_rng(23)
    frames = make_frames(64, 64, 17, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=31, gop=8, seed=23,
                               intra_period=8)
    waves = []
    orig = MeshFrameDecoder.reconstruct_wave

    def spy(self, fs_list, refs_list=None):
        waves.append([bool(fs.inter_pbs) for fs in fs_list])
        return orig(self, fs_list, refs_list)

    MeshFrameDecoder.reconstruct_wave = spy
    try:
        _compare(data, 17)
    finally:
        MeshFrameDecoder.reconstruct_wave = orig
    inter_waves = [w for w in waves if any(w)]
    assert inter_waves, "no inter pictures reached the mesh waves"
    assert max(len(w) for w in inter_waves) >= 3, waves


def test_wave_odd_count_padding():
    """Wave of 5 on an 8-device mesh: shard padding replicates the last
    frame and drops the copies."""
    rng = np.random.default_rng(24)
    frames = make_frames(48, 32, 5, rng)
    data, _ = encode_intra_stream(frames, 48, 32, qp=30, seed=24)
    _compare(data, 5)


def _mesh2d(n_frame=2, n_tile=4):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices("cpu")
    need = n_frame * n_tile
    if len(devs) < need:
        pytest.skip(f"needs {need} virtual CPU devices")
    return Mesh(np.array(devs[:need]).reshape(n_frame, n_tile),
                ("frame", "tile"))


def _compare2d(data, n, n_frame=2, n_tile=4):
    ref = Decoder("np")
    want = [p.cropped() for p in (ref.decode(data) + ref.flush())]
    d = Decoder("jax", mesh=_mesh2d(n_frame, n_tile))
    got = [p.cropped() for p in (d.decode(data) + d.flush())]
    assert len(got) == len(want) == n
    for i in range(n):
        for c in range(3):
            assert np.array_equal(np.asarray(got[i][c], np.int64),
                                  np.asarray(want[i][c], np.int64)), (i, c)


def test_wave_tile_axis_intra_tiles():
    """(frame x tile) 2-D mesh: HEVC-tiled pictures shard their
    residual + intra work over the tile axis (hevc.c:2917), the shards
    combine via a masked psum (the hevc.c:2967 cross-tile filter
    fix-up), bit-exact vs the sequential np engine."""
    rng = np.random.default_rng(31)
    frames = make_frames(96, 64, 4, rng)
    data, _ = encode_intra_stream(frames, 96, 64, qp=30, ctb_log2=4,
                                  seed=31, tile_cols=3, tile_rows=2,
                                  sao=True, deblock=True)
    _compare2d(data, 4)


def test_wave_tile_axis_untiled_stream():
    """Untiled pictures on a 2-D mesh still decode (tile shard 0 does
    the intra work; residual splits across shards; psum combines)."""
    rng = np.random.default_rng(32)
    frames = make_frames(64, 64, 4, rng)
    data, _ = encode_intra_stream(frames, 64, 64, qp=30, seed=32)
    _compare2d(data, 4)


def test_wave_tile_axis_ra_inter():
    """Inter waves on the 2-D mesh: motion/ref pool replicated over the
    tile axis, residual tile-split, masked psum combine."""
    rng = np.random.default_rng(33)
    frames = make_frames(64, 64, 9, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=31, gop=8, seed=33)
    _compare2d(data, 9)


def test_wave_weighted_pred_ra():
    """Weighted-pred pictures join waves (formerly serialized by the
    `fs.weights is None` gate): multi-picture waves containing weighted
    members form and stay bit-exact. Unweighted members ride identity
    weights (w=1, o=0, denom=0 == default combine, ops/mc.py)."""
    from openhevc_tpu.parallel import MeshFrameDecoder
    rng = np.random.default_rng(25)
    frames = make_frames(64, 64, 17, rng)
    data, _ = encode_ra_stream(frames, 64, 64, qp=31, gop=8, seed=25,
                               weighted=True)
    waves = []
    orig = MeshFrameDecoder.reconstruct_wave

    def spy(self, fs_list, refs_list=None):
        waves.append([fs.weights is not None for fs in fs_list])
        return orig(self, fs_list, refs_list)

    MeshFrameDecoder.reconstruct_wave = spy
    try:
        _compare(data, 17)
    finally:
        MeshFrameDecoder.reconstruct_wave = orig
    wt_waves = [w for w in waves if any(w) and len(w) >= 3]
    assert wt_waves, f"no multi-picture weighted waves formed: {waves}"


@pytest.mark.slow
def test_mesh_1080p_tiled_bitexact():
    """Production-resolution multi-chip coverage (VERDICT r04 item 7):
    the ra_tiles bench stream (1920x1080 hierarchical-B, 4x2 HEVC
    tiles, deblock+SAO) decoded on the 2-D frame x tile mesh, hashed
    against the reference-decoder oracle md5 sidecar. Exercises the
    tile-grouped residual path and band-sharded filters at real CTB
    counts (hevc.c:2917,2967)."""
    import hashlib
    import pathlib
    import jax
    from jax.sharding import Mesh

    p = (pathlib.Path(__file__).parent.parent / "bench_streams" /
         "r4a_ra_tiles_1080p.265")
    if not p.exists():
        pytest.skip("bench stream not present")
    want = (p.parent / (p.name + ".md5")).read_text().split()
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = Mesh(np.array(devs[:8]).reshape(4, 2), ("frame", "tile"))
    d = Decoder("jax", mesh=mesh)
    pics = d.decode(p.read_bytes()) + d.flush()
    assert len(pics) == 9
    hs = []
    for pic in pics:
        y, u, v = pic.cropped()
        h = hashlib.md5()
        h.update(np.ascontiguousarray(np.asarray(y, np.uint8)).tobytes())
        h.update(np.ascontiguousarray(np.asarray(u, np.uint8)).tobytes())
        h.update(np.ascontiguousarray(np.asarray(v, np.uint8)).tobytes())
        hs.append(h.hexdigest())
    assert hs == want[:9]
