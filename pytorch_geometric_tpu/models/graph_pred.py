"""Graph-level prediction models (readout head over the conv zoo).

Mirrors the reference's graph-classification examples (GIN on MUTAG,
examples/mutag_gin.py:25-59; TopK on ENZYMES,
examples/enzymes_topk_pool.py:24-48): conv stack -> global readout ->
MLP head.
"""

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.conv.gcn_conv import GCNConv, gcn_norm
from pytorch_geometric_tpu.nn.pool.global_pool import global_mean_pool


class GraphClassifier(nn.Module):
    """GCN stack + mean readout + linear head."""

    hidden_channels: int
    num_classes: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, graph: Graph, x=None, *, train: bool = False):
        x = graph.x if x is None else x
        norm = gcn_norm(graph)
        for i in range(self.num_layers):
            x = GCNConv(self.hidden_channels, name=f"conv{i + 1}")(
                graph, x, norm=norm)
            x = nn.relu(x)
        g = global_mean_pool(x, graph)          # (num_graphs, H)
        return nn.Dense(self.num_classes)(g)    # logits incl. pad graph


def graph_xent_loss(logits, y, graph_mask):
    from pytorch_geometric_tpu.models.citation import (
        softmax_xent_int_labels)
    nll = softmax_xent_int_labels(logits, y)
    m = graph_mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
