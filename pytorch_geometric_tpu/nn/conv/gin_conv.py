"""GIN convolution (Xu et al.).

Reference counterpart: ``torch_geometric.nn.GINConv`` (reference usage:
examples/mutag_gin.py:8,25-43 — wraps an arbitrary MLP).  Semantics:
x' = MLP((1 + eps) x + sum_j x_j); eps trainable iff train_eps.
"""

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.message_passing import propagate


class GINConv(nn.Module):
    mlp: Callable          # flax Module applied to aggregated features
    eps: float = 0.0
    train_eps: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False):
        agg = propagate(graph, x, aggr="add",
                        edge_weight=graph.real_edge_mask().astype(x.dtype))
        if self.train_eps:
            eps = self.param("eps", lambda k, s: jnp.full(s, self.eps),
                             ())
        else:
            eps = self.eps
        out = (1.0 + eps) * x + agg
        # The wrapped MLP may want the node mask (padding-aware BatchNorm)
        # and/or a train flag; degrade gracefully for plain modules.
        for kwargs in ({"mask": graph.node_mask, "train": train},
                       {"train": train}, {}):
            try:
                return self.mlp(out, **kwargs)
            except TypeError:
                continue
        return self.mlp(out)
