"""EdgeConv (Wang et al., DGCNN).

Reference counterpart: the README MessagePassing tutorial builds exactly
this conv (reference README.md:29-49: message = MLP([x_i, x_j - x_i]),
max aggregation).  ``DynamicEdgeConv`` recomputes the kNN graph from
features at loader time (host kNN via the C++ cluster kernels).
"""

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.message_passing import propagate


class EdgeConv(nn.Module):
    mlp: Callable     # flax module: (E, 2F) -> (E, C)
    aggr: str = "max"

    @nn.compact
    def __call__(self, graph: Graph, x):
        def message(x_j, x_i, _):
            return self.mlp(jnp.concatenate([x_i, x_j - x_i], axis=-1))

        return propagate(graph, x, message_fn=message, aggr=self.aggr)
