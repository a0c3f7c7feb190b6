"""Simplified Graph Convolution (Wu et al.).

Reference counterpart: ``torch_geometric.nn.SGConv`` (reference usage:
examples/sgc.py:6,17-18 — K=2, cached=True).  Semantics:
x' = (D^-1/2 (A+I) D^-1/2)^K x W.

TPU note: the propagated features depend only on the static graph, so
``sgc_precompute`` runs once (the reference's ``cached=True``) and
training is then a pure dense matmul — MXU-only.
"""

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.spmm import spmm


def sgc_precompute(graph: Graph, x, K: int):
    """(A_hat)^K x — the cacheable part."""
    norm = gcn_norm(graph)
    for _ in range(K):
        x = spmm(norm.senders, norm.receivers, x, graph.num_nodes,
                 weights=norm.weights)
    return x


class SGConv(nn.Module):
    out_channels: int
    K: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, cached_x=None):
        h = cached_x if cached_x is not None else \
            sgc_precompute(graph, x, self.K)
        weight = self.param("weight", glorot,
                            (h.shape[-1], self.out_channels))
        out = jnp.dot(h, weight, preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,))
        return out
