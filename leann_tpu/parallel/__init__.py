"""Multi-chip scaling: mesh + sharded search.

The reference is strictly single-process/single-host (SURVEY §2.4: no
DP/TP/PP, no NCCL/MPI — its only concurrency is a tokio runtime). The
TPU-native answer is corpus sharding over a `jax.sharding.Mesh`:

  - vector blocks (or per-shard subgraphs) live row-sharded across
    chips' HBM
  - a query batch is data-parallel over the `dp` axis
  - every chip searches its local shard; per-shard top-k candidates are
    combined with one `all_gather` over the `shard` axis (ICI) and a
    final top-k — the only cross-chip traffic is B x k ids+scores

Collectives come from XLA via shard_map; there is no hand-written
communication backend to maintain.
"""

from leann_tpu.parallel.mesh import init_distributed, make_mesh
from leann_tpu.parallel.sharded import (
    ShardedFlatIndex,
    ShardedGraphIndex,
    ShardedIvf8Index,
    ShardedIvfIndex,
)

__all__ = ["init_distributed", "make_mesh", "ShardedFlatIndex", "ShardedGraphIndex",
           "ShardedIvfIndex", "ShardedIvf8Index"]
