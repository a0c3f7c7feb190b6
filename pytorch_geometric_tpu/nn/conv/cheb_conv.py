"""Chebyshev spectral convolution (Defferrard et al.).

Reference counterpart: ``torch_geometric.nn.ChebConv`` (reference usage:
examples/gcn.py:7 import; ConvexPruning.py:259-264 — order K nets).
Semantics (PyG 1.4.x, lambda_max assumed 2): L~ = L_sym - I =
-D^-1/2 A D^-1/2; recurrence T_0 = x, T_1 = L~ x,
T_k = 2 L~ T_{k-1} - T_{k-2}; out = sum_k T_k W_k + b.

TPU note: the recurrence is K-1 SpMMs over the same static edge set —
unrolled at trace time (K is a static hyperparameter), XLA pipelines them.
"""

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.segment import segment_sum
from pytorch_geometric_tpu.ops.spmm import spmm


class ChebConv(nn.Module):
    out_channels: int
    K: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, edge_weight=None):
        N = graph.num_nodes
        if edge_weight is None:
            edge_weight = graph.real_edge_mask().astype(x.dtype)
        # L~ = -D^-1/2 A D^-1/2  (lambda_max = 2 convention)
        deg = segment_sum(edge_weight, graph.receivers, N)
        dis = jnp.where(deg > 0, jnp.maximum(deg, 1e-12) ** -0.5, 0.0)
        lap_w = -dis[graph.senders] * edge_weight * dis[graph.receivers]

        weights = self.param("weight", glorot,
                             (self.K, x.shape[-1], self.out_channels))
        tx_prev_prev = x
        out = jnp.dot(x, weights[0], preferred_element_type=jnp.float32)
        if self.K > 1:
            tx_prev = spmm(graph.senders, graph.receivers, x, N,
                           weights=lap_w,
                           indices_are_sorted=graph.edges_sorted)
            out = out + jnp.dot(tx_prev, weights[1],
                                preferred_element_type=jnp.float32)
            for k in range(2, self.K):
                tx = 2.0 * spmm(graph.senders, graph.receivers, tx_prev, N,
                                weights=lap_w,
                                indices_are_sorted=graph.edges_sorted) \
                    - tx_prev_prev
                out = out + jnp.dot(tx, weights[k],
                                    preferred_element_type=jnp.float32)
                tx_prev_prev, tx_prev = tx_prev, tx
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,))
        return out
