"""Node degree (reference: torch_geometric.utils.degree,
examples/faust.py:9,19)."""

import jax.numpy as jnp

from pytorch_geometric_tpu.ops.segment import segment_sum


def degree(index, num_nodes, dtype=jnp.float32, weights=None, mask=None):
    """Count (or weight-sum) of entries per node id in ``index``.

    ``mask`` excludes padding edges (padding already routes to the padding
    node, so this only matters when indices were filtered in-place)."""
    ones = jnp.ones(index.shape, dtype=dtype) if weights is None else weights
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    return segment_sum(ones, index, num_nodes)
