"""Configurable-width model zoo for the pruning pipeline.

Reference counterpart: ConvexPruning.py:175-338 — GCN3 / GAT3 / ChebNet /
AGNN / SplineNet / TopKNet classes whose hidden widths come from a
``width`` list (produced by ContractionLayerCoefficients or
RetainNetworkSize), so the net can be rebuilt smaller after SVD pruning
(ConvexPruning.py:551-566).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.conv import (
    AGNNConv,
    ChebConv,
    GATConv,
    GCNConv,
    GraphConv,
    SplineConv,
    gcn_norm,
)
from pytorch_geometric_tpu.nn.pool import (
    TopKPooling,
    global_max_pool,
    global_mean_pool,
)


class PrunableGCN(nn.Module):
    """GCN stack with per-layer widths (reference GCN3,
    ConvexPruning.py:180-200)."""

    widths: Tuple[int, ...]
    num_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False):
        norm = gcn_norm(graph)
        for i, w in enumerate(self.widths):
            x = GCNConv(w, name=f"layers_{i}")(graph, x, norm=norm)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return GCNConv(self.num_classes, name="out")(graph, x, norm=norm)


class PrunableGAT(nn.Module):
    widths: Tuple[int, ...]
    num_classes: int
    heads: int = 8
    dropout: float = 0.6

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False,
                 flash_op=None):
        # ``flash_op`` (a PackedFlashGat / FlashGat built once per graph)
        # routes every layer through the fused Pallas attention backends
        # (ops/packed_gat.py) instead of the generic segment-softmax path
        for i, w in enumerate(self.widths):
            x = GATConv(max(w // self.heads, 1), heads=self.heads,
                        dropout=self.dropout,
                        name=f"layers_{i}")(graph, x, train=train,
                                            flash_op=flash_op)
            x = nn.elu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return GATConv(self.num_classes, heads=1, concat=False,
                       name="out")(graph, x, train=train,
                                   flash_op=flash_op)


class PrunableCheb(nn.Module):
    widths: Tuple[int, ...]
    num_classes: int
    K: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False):
        for i, w in enumerate(self.widths):
            x = nn.relu(ChebConv(w, K=self.K,
                                 name=f"layers_{i}")(graph, x))
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return ChebConv(self.num_classes, K=self.K, name="out")(graph, x)


class PrunableAGNN(nn.Module):
    """Dense-in -> AGNN propagation x len(widths) -> dense-out
    (reference ConvexPruning.py:236-258)."""

    widths: Tuple[int, ...]
    num_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.widths[0], name="layers_0")(x))
        for i in range(1, len(self.widths)):
            x = AGNNConv(requires_grad=True, name=f"prop_{i}")(graph, x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="out")(x)


class PrunableSpline(nn.Module):
    """SplineConv stack with per-layer widths (reference SplineNet,
    ConvexPruning.py:278-299 — dim=1, kernel_size=2, swish
    ``x * sigmoid(x)`` activations between layers).

    Citation graphs carry no geometric edge attributes; absent
    ``graph.edge_attr`` the pseudo-coordinates default to 0.5 (the
    centre of the open-spline domain), matching the constant-pseudo
    usage of the upstream Cora SplineConv example.
    """

    widths: Tuple[int, ...]
    num_classes: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False):
        pseudo = graph.edge_attr
        if pseudo is None:
            pseudo = jnp.full((graph.senders.shape[0], 1), 0.5,
                              jnp.float32)
        elif pseudo.ndim == 1:
            pseudo = pseudo[:, None]
        for i, w in enumerate(self.widths):
            x = SplineConv(w, dim=pseudo.shape[1], kernel_size=2,
                           name=f"layers_{i}")(graph, x, pseudo=pseudo)
            x = x * jax.nn.sigmoid(x)
        return SplineConv(self.num_classes, dim=pseudo.shape[1],
                          kernel_size=2, name="out")(graph, x,
                                                     pseudo=pseudo)


class PrunableTopK(nn.Module):
    """GraphConv + TopKPooling graph classifier (reference TopKNet,
    ConvexPruning.py:306-338)."""

    widths: Tuple[int, ...]
    num_classes: int
    ratio: float = 0.8

    @nn.compact
    def __call__(self, graph: Graph, *, train: bool = False):
        x = graph.x
        g = graph
        summaries = []
        common = 2 * self.widths[-1]
        for i, w in enumerate(self.widths):
            x = nn.relu(GraphConv(w, name=f"layers_{i}")(g, x))
            g = g.replace(x=x)
            g, x, _ = TopKPooling(w, ratio=self.ratio,
                                  name=f"pool_{i}")(g, x)
            s = jnp.concatenate(
                [global_max_pool(x, g), global_mean_pool(x, g)], axis=1)
            # per-level widths differ after pruning; project readouts to
            # a common dim before the residual sum
            summaries.append(nn.Dense(common, name=f"proj_{i}")(s))
        h = sum(summaries)
        h = nn.relu(nn.Dense(self.widths[-1], name="lin1")(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes, name="out")(h)


MODEL_ZOO = {
    "GCN": PrunableGCN,
    "GAT": PrunableGAT,
    "Cheb": PrunableCheb,
    "AGNN": PrunableAGNN,
    "Spline": PrunableSpline,
    "TopK": PrunableTopK,
}


def choose_model(name: str, widths: Sequence[int], num_classes: int,
                 **kwargs):
    """Reference ChooseModel (ConvexPruning.py:31-44)."""
    try:
        cls = MODEL_ZOO[name]
    except KeyError:
        raise ValueError(
            f"model {name!r} not in zoo {sorted(MODEL_ZOO)}")
    return cls(widths=tuple(int(w) for w in widths),
               num_classes=num_classes, **kwargs)
