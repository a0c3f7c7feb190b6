"""GCN convolution (Kipf & Welling).

Reference counterpart: ``torch_geometric.nn.GCNConv`` (reference usage:
examples/gcn.py:7,18-19 with ``cached=True``; ConvexPruning.py:180-185).
Semantics: x' = D^-1/2 (A + fI) D^-1/2 x W + b with f = 2 if improved
else 1.

TPU design notes:
- the normalised adjacency depends only on the (static) graph, so it is
  computed once per graph and reused — the analog of the reference's
  ``cached=True`` memoisation, except here the cache is an explicit
  :class:`EdgeNorm` pytree (pass it back in; pure functions don't hide
  state);
- the aggregation is one weighted SpMM: XLA segment-sum path by default,
  or a bound Pallas ``SpmmOperator`` built over the self-loop-extended
  edge set for the MXU one-hot kernel.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.segment import segment_sum
from pytorch_geometric_tpu.ops.spmm import spmm
from pytorch_geometric_tpu.utils.loop import add_self_loops


@struct.dataclass
class EdgeNorm:
    """Cached normalised edge set (self loops appended)."""
    senders: jnp.ndarray
    receivers: jnp.ndarray
    weights: jnp.ndarray


def gcn_norm_dense(graph: Graph, edge_weight=None, improved: bool = False,
                   dtype=jnp.float32):
    """Dense normalised adjacency (N, N) for small padded graphs.

    TPU rationale: below ~4k padded nodes the sparse path is dominated
    by per-kernel overheads (gather + scatter kernels per layer), while
    one dense matmul keeps the whole aggregation on the MXU.  Memory is
    N^2 * dtype — callers opt in via ``GCNConv(..., norm_dense=...)``.
    """
    norm = gcn_norm(graph, edge_weight, improved, jnp.float32)
    n = graph.num_nodes
    adj = jnp.zeros((n, n), jnp.float32)
    adj = adj.at[norm.receivers, norm.senders].add(norm.weights)
    return adj.astype(dtype)


def gcn_norm(graph: Graph, edge_weight=None, improved: bool = False,
             dtype=jnp.float32) -> EdgeNorm:
    """Symmetric normalisation with self loops: the first-call computation
    the reference memoises under ``cached=True`` (examples/gcn.py:18)."""
    N = graph.num_nodes
    fill = 2.0 if improved else 1.0
    if edge_weight is None:
        edge_weight = graph.real_edge_mask().astype(dtype)
    senders, receivers, w = add_self_loops(
        graph.senders, graph.receivers, N, edge_weight, fill_value=fill)
    deg = segment_sum(w, receivers, N)
    dis = jnp.where(deg > 0, jnp.maximum(deg, 1e-12) ** -0.5, 0.0)
    norm = dis[senders] * w * dis[receivers]
    return EdgeNorm(senders=senders, receivers=receivers, weights=norm)


def gcn_closure_norm(edge_index, num_nodes: int, layers,
                     improved: bool = False):
    """Per-layer (w_edge, w_self) for closure-mode GCNConv.

    Degrees come from the FULL graph (a closure only keeps all
    in-edges of *needed* receivers, so sender degrees cannot be
    recovered from the closure itself).  Host-side numpy; static.
    """
    import numpy as np

    fill = 2.0 if improved else 1.0
    ei = np.asarray(edge_index)
    deg = np.bincount(ei[1], minlength=num_nodes).astype(np.float64)
    deg = deg + fill
    dis = deg ** -0.5
    norms = []
    for cl in layers:
        sg = np.asarray(cl.sender_global)
        rg = np.asarray(cl.out_global)[np.asarray(cl.receivers)]
        m = np.asarray(cl.edge_mask)
        w_edge = np.where(m, dis[sg] * dis[rg], 0.0)
        og = np.asarray(cl.out_global)
        w_self = fill / deg[og]
        w_self[cl.num_real_out:] = 0.0
        norms.append((jnp.asarray(w_edge, jnp.float32),
                      jnp.asarray(w_self, jnp.float32)))
    return norms


class GCNConv(nn.Module):
    out_channels: int
    improved: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, edge_weight=None,
                 norm: Optional[EdgeNorm] = None, spmm_op=None,
                 norm_dense=None, aggregate_fn=None, closure=None,
                 shard_ctx=None):
        weight = self.param("weight", glorot, (x.shape[-1],
                                               self.out_channels))
        h = jnp.dot(x, weight, preferred_element_type=jnp.float32)
        if shard_ctx is not None:
            # distributed path (parallel/api.py): x is this device's
            # (S, F) node shard; aggregation = fast-kernel halo SpMM
            # with the partition's precomputed GCN-norm weighting
            # (self loops + symmetric normalisation already in the
            # weights, matching gcn_norm above)
            out = shard_ctx.aggregate("gcn", h)
            if self.use_bias:
                out = out + self.param("bias", zeros,
                                       (self.out_channels,))
            return out
        if closure is not None:
            # bipartite/closure mode (data/closure.py): norm is the
            # (w_edge, w_self) pair from gcn_closure_norm — weights use
            # FULL-graph degrees, so results equal the full-graph conv
            # restricted to the closure's output nodes
            w_edge, w_self = norm
            msgs = jnp.take(h, closure.senders, axis=0) \
                * w_edge[:, None]
            out = segment_sum(msgs, closure.receivers, closure.n_out)
            out = out + w_self[:, None] \
                * jnp.take(h, closure.self_idx, axis=0)
            if self.use_bias:
                out = out + self.param("bias", zeros,
                                       (self.out_channels,))
            return out
        if aggregate_fn is not None:
            # fully custom aggregation (e.g. a pre-packed Pallas SpMM
            # closure with the static normalised weights baked in)
            out = aggregate_fn(h)
        elif norm_dense is not None:
            out = jnp.dot(norm_dense, h.astype(norm_dense.dtype),
                          preferred_element_type=jnp.float32)
        elif spmm_op is not None:
            if norm is None:
                norm = gcn_norm(graph, edge_weight, self.improved,
                                h.dtype)
            out = spmm_op(norm.weights, h)
        else:
            if norm is None:
                norm = gcn_norm(graph, edge_weight, self.improved,
                                h.dtype)
            out = spmm(norm.senders, norm.receivers, h, graph.num_nodes,
                       weights=norm.weights)
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,))
        return out
