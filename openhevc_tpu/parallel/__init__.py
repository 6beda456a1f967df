"""Multi-frame / multi-chip decode runtime.

Two axes of parallelism over the reference's frame-threading model
(pthread_frame.c:325-513), re-designed for the TPU execution model:

- frames.py: dependency-aware wave scheduling — consecutive pictures
  whose reference sets are disjoint from the wave batch together (all
  intra pictures; same-level hierarchical-B pictures).
- mesh.py:   batched single-dispatch reconstruction of a wave, sharded
  over the `frame` axis of a jax.sharding.Mesh (SPMD via shard_map;
  on one chip the same batching amortizes dispatch overhead).

The production Decoder drives both: `Decoder("jax", mesh=mesh)`.
"""
from .frames import WaveScheduler
from .mesh import MeshFrameDecoder

__all__ = ["WaveScheduler", "MeshFrameDecoder"]
