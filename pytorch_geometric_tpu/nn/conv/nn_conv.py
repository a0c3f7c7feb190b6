"""Edge-conditioned convolution (NNConv / ECC, Gilmer/Simonovsky).

Reference counterpart: ``torch_geometric.nn.NNConv`` (reference usage:
examples/mnist_nn_conv.py:10,31-34 — aggr='mean';
examples/qm9_nn_conv.py:9,74-75 — MPNN on QM9).  Semantics:
x'_i = W_root x_i + aggr_j x_j . Theta(e_ij), where Theta maps edge_attr
to an (F_in x F_out) matrix via an arbitrary MLP.

TPU note: the per-edge matrix-vector product is an einsum over the edge
dim — E x F_in x F_out MACs on the MXU; the edge-MLP output reshape is
free.  Padding edges produce garbage messages but carry zero aggregation
weight (mask), so no branching.
"""

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.nn.message_passing import propagate


class NNConv(nn.Module):
    out_channels: int
    edge_nn: Callable     # flax module: (E, Fe) -> (E, F_in * out_channels)
    aggr: str = "add"
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, edge_attr=None):
        ea = edge_attr if edge_attr is not None else graph.edge_attr
        F_in, C = x.shape[-1], self.out_channels
        theta = self.edge_nn(ea).reshape(-1, F_in, C)   # (E, F_in, C)

        def message(x_j, x_i, _):
            return jnp.einsum("ef,efc->ec", x_j, theta)

        out = propagate(graph, x, message_fn=message, aggr=self.aggr,
                        edge_weight=None if self.aggr != "add" else
                        graph.real_edge_mask().astype(x.dtype))
        if self.root_weight:
            w = self.param("root", glorot, (F_in, C))
            out = out + jnp.dot(x, w, preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param("bias", zeros, (C,))
        return out
