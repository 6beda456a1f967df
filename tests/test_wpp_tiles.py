"""WPP (entropy coding sync) and tiles conformance vs the reference.

Covers per-substream CABAC handling (tile context resets, WPP top-right
context inheritance + save-after-2-CTBs), entry-point offsets (escaped-byte
accounting), tile-scan decode order, tile-boundary availability, and the
tile-scan loop-filter schedule."""
import numpy as np
import pytest

from conftest import ref_decode, ref_planes

from openhevc_tpu.encoder.intra_enc import encode_intra_stream
from openhevc_tpu.encoder.inter_enc import encode_lowdelay_stream
from openhevc_tpu.decoder import Decoder
from test_inter import moving_frames


def check(data, n, W, H):
    ref = ref_decode(data)
    d = Decoder("np")
    mine = d.decode(data) + d.flush()
    assert len(ref) == len(mine) == n
    for i, f in enumerate(ref):
        for p, (got, want) in enumerate(zip(mine[i].cropped(),
                                            ref_planes(f))):
            assert np.array_equal(got, want), (i, p)


@pytest.mark.parametrize("kw", [
    dict(wpp=True),
    dict(tile_cols=2, tile_rows=2),
    dict(tile_cols=3, tile_rows=1, sao=True, deblock=True),
    dict(wpp=True, sao=True, deblock=True),
    dict(tile_cols=2, tile_rows=2, pcm=True),
])
def test_wpp_tiles_intra(kw):
    seed = sum(map(ord, str(sorted(kw.items()))))
    rng = np.random.default_rng(seed)
    W, H = 96, 64
    frames = moving_frames(W, H, 2, rng)
    data, _ = encode_intra_stream(frames, W, H, qp=30, ctb_log2=4,
                                  seed=seed, **kw)
    check(data, 2, W, H)


def test_wpp_lowdelay_p():
    rng = np.random.default_rng(77)
    W, H = 96, 64
    frames = moving_frames(W, H, 3, rng)
    data, _ = encode_lowdelay_stream(frames, W, H, qp=32, ctb_log2=4,
                                     seed=77, wpp=True)
    check(data, 3, W, H)
