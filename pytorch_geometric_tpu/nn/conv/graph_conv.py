"""GraphConv — Weisfeiler-Leman conv (Morris et al.).

Reference counterpart: ``torch_geometric.nn.GraphConv`` (reference usage:
examples/enzymes_topk_pool.py:7,24-28).  Semantics:
x' = W1 x + W2 . aggr_j x_j (+ optional edge weights), aggr default add.
"""

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.nn.message_passing import propagate


class GraphConv(nn.Module):
    out_channels: int
    aggr: str = "add"
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, edge_weight=None):
        w_root = self.param("weight_root", glorot,
                            (x.shape[-1], self.out_channels))
        w_nbr = self.param("weight_nbr", glorot,
                           (x.shape[-1], self.out_channels))
        if edge_weight is None and graph.edge_mask is not None and \
                self.aggr in ("add", "sum"):
            edge_weight = graph.edge_mask.astype(x.dtype)
        agg = propagate(graph, x, aggr=self.aggr, edge_weight=edge_weight)
        out = jnp.dot(x, w_root, preferred_element_type=jnp.float32) + \
            jnp.dot(agg, w_nbr, preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,))
        return out
