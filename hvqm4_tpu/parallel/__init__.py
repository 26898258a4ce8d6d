"""Parallel decode: vmap multi-stream batching and mesh sharding (SURVEY.md §2.6).

The codec's honest parallelism axes on TPU: *within-frame* (the device core's
block grid), *across streams* on one chip (`vmap` — the reference's "data
parallelism" analogue), and *across chips* (`shard_map`/NamedSharding over a
`jax.sharding.Mesh` — embarrassingly parallel, zero collectives by design;
the downstream ViT feed adds genuine tensor-parallel collectives).
"""

from .multistream import MultiStreamDecoder, multi_frame_step  # noqa: F401
