"""Device kernels (JAX / XLA / Pallas).

- distance.py  tiled batched distance computation + exact top-k
               (the recall oracle; also the engine behind recompute mode)
- topk.py      top-k merge utilities
- beam.py      frontier-batched graph beam search (lax.while_loop)
- vamana.py    batched Vamana graph construction (greedy search +
               robust prune as device kernels)
- pallas_kernels.py  hand-written Pallas kernels for the hot ops
"""

from leann_tpu.ops.distance import exact_topk, pairwise_scores

__all__ = ["exact_topk", "pairwise_scores"]
