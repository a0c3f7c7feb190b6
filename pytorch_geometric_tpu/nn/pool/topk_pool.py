"""TopK pooling (Gao & Ji / Cangea et al.).

Reference counterpart: ``torch_geometric.nn.TopKPooling`` (reference
usage: examples/enzymes_topk_pool.py:25-47 — ratio 0.8 stacks;
ConvexPruning.py:306-330).  Semantics: score = x . p / ||p||; keep the
top ceil(ratio * n_i) nodes of each graph; gate kept features with
tanh(score); drop edges touching dropped nodes.

TPU redesign: the reference *compacts* tensors (dynamic shapes).  Here
shapes are static — pooling returns a new ``Graph`` with updated
``node_mask`` / ``edge_mask`` and gated features; downstream segment ops
are mask-correct, so semantics match without any recompile.  The
per-graph rank is computed with one argsort over (batch, -score).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import uniform
from pytorch_geometric_tpu.ops.segment import segment_sum


def topk_mask(score, graph: Graph, ratio: float):
    """Boolean mask of per-graph top-ceil(ratio*n) scores (padding-aware)."""
    N = graph.num_nodes
    batch = graph.batch if graph.batch is not None else \
        jnp.zeros((N,), jnp.int32)
    nm = graph.real_node_mask()
    G = graph.num_graphs
    # rank within graph: sort by (batch, -score); padded nodes last
    key_batch = jnp.where(nm, batch, G)
    order = jnp.lexsort((-score, key_batch))
    # position of each node in its graph's sorted list
    sorted_batch = key_batch[order]
    start = jnp.searchsorted(sorted_batch, jnp.arange(G + 1))
    pos_in_sorted = jnp.arange(N) - start[sorted_batch]
    rank = jnp.zeros((N,), jnp.int32).at[order].set(
        pos_in_sorted.astype(jnp.int32))
    # per-graph budget
    counts = segment_sum(nm.astype(jnp.int32), batch, G)
    k = jnp.ceil(ratio * counts).astype(jnp.int32)
    return nm & (rank < k[batch])


class TopKPooling(nn.Module):
    in_channels: int
    ratio: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x, edge_attr=None
                 ) -> Tuple[Graph, jnp.ndarray, jnp.ndarray]:
        """Returns (pooled_graph, gated_x, score) — the reference's
        (x, edge_index, edge_attr, batch, perm, score) tuple collapses to
        a masked Graph + arrays under the static-shape design."""
        p = self.param("weight", uniform(self.in_channels),
                       (self.in_channels,))
        score = jnp.dot(x, p) / jnp.maximum(jnp.linalg.norm(p), 1e-12)
        keep = topk_mask(score, graph, self.ratio)
        gated = x * jnp.tanh(score)[:, None]
        gated = jnp.where(keep[:, None], gated, 0.0)
        ekeep = keep[graph.senders] & keep[graph.receivers] & \
            graph.real_edge_mask()
        new_graph = graph.replace(
            node_mask=keep,
            edge_mask=ekeep,
            x=gated,
            edge_attr=edge_attr if edge_attr is not None
            else graph.edge_attr,
        )
        return new_graph, gated, score
