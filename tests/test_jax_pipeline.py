"""JAX/TPU reconstruction pipeline vs numpy oracle and encoder recon."""
import numpy as np
import pytest

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
