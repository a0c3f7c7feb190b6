"""Normalized cut edge weights (reference:
torch_geometric.utils.normalized_cut, examples/mnist_graclus.py:8,22-25):
w'_ij = w_ij * (1/deg(i) + 1/deg(j))."""

import jax.numpy as jnp

from pytorch_geometric_tpu.utils.degree import degree


def normalized_cut(senders, receivers, edge_weight, num_nodes, mask=None):
    deg = degree(receivers, num_nodes, dtype=edge_weight.dtype, mask=mask)
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
    out = edge_weight * (inv[senders] + inv[receivers])
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out
