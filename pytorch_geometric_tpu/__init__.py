"""TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference research fork ``ggzhang0071/pytorch_geometric-1`` (PyTorch
Geometric 1.4.x surface + the fork's pruning / spectral-analysis research
layer), designed TPU-first:

- static-shape graphs (padded / bucketed) so XLA compiles once per bucket,
- gather -> edge-map -> segment-reduce -> update expressed as pure
  functions over a ``Graph`` pytree,
- Pallas SpMM / segment kernels on the hot path, XLA segment ops as the
  always-correct fallback,
- multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` collectives
  (data parallel over graph shards; edge-partitioned halo exchange).

The global debug flag mirrors ``torch_geometric.is_debug_enabled()``
(reference: gmm_conv.py:106-129 gates validation on it).
"""

__version__ = "0.1.0"

from pytorch_geometric_tpu.debug import (  # noqa: F401
    is_debug_enabled,
    set_debug,
    debug,
)

__all__ = [
    "is_debug_enabled",
    "set_debug",
    "debug",
    "__version__",
]
