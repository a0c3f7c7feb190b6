"""The message-passing core: gather -> edge-map -> segment-reduce -> update.

This is the centerpiece contract the entire conv zoo hangs off (reference
SURVEY §3.5 — ``propagate`` gathers x_j = x[edge_index[0]], applies
``message``, scatter-reduces by edge_index[1], then ``update``s).  Instead
of the reference's object-oriented dispatch (MessagePassing.propagate
resolving ``message``/``update`` by inspection), the TPU design is a pure
function: convs call :func:`propagate` with an explicit ``message_fn``
closure, shapes are static, and the aggregation bottoms out in either XLA
segment ops or a bound Pallas SpMM operator.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.ops.segment import scatter

AGGRS = ("add", "sum", "mean", "max", "min")


def propagate(
    graph: Graph,
    x,
    message_fn: Optional[Callable] = None,
    aggr: str = "add",
    edge_weight=None,
    x_dst=None,
    spmm_op=None,
):
    """Run one message-passing round over ``graph``.

    Parameters
    ----------
    graph : Graph with static (padded) shapes.  Padding edges point at a
        padding node, so no masking is needed for sum aggregation;
        mean/max aggregations mask via ``graph.edge_mask``.
    x : (N, ...) source node features.
    message_fn : optional ``(x_j, x_i, edge_attr) -> messages``; default
        identity on ``x_j`` (pure gather-aggregate).
    aggr : one of add/sum/mean/max/min (reference aggr choice,
        gmm_conv.py:55-58).
    edge_weight : optional (E,) multiplier applied to messages
        (e.g. GCN's normalised adjacency values).
    x_dst : optional distinct destination features for bipartite message
        functions (x_i gathered from these).
    spmm_op : optional bound Pallas ``SpmmOperator`` — used for the
        weighted-sum fast path (identity message + add aggregation).
    """
    if aggr not in AGGRS:
        raise ValueError(f"aggr must be one of {AGGRS}, got {aggr!r}")
    num_nodes = graph.num_nodes

    # Debug-mode input validation (reference: gmm_conv.py:106-129 gated
    # by torch_geometric.is_debug_enabled()).  Host-side only — concrete
    # arrays, never traced values.
    from pytorch_geometric_tpu.debug import is_debug_enabled
    if is_debug_enabled() and not isinstance(
            graph.senders, jax.core.Tracer):
        import numpy as np
        s = np.asarray(graph.senders)
        r = np.asarray(graph.receivers)
        if s.shape != r.shape:
            raise ValueError("senders/receivers shape mismatch: "
                             f"{s.shape} vs {r.shape}")
        if s.size and (s.min() < 0 or s.max() >= num_nodes or
                       r.min() < 0 or r.max() >= num_nodes):
            raise ValueError(
                f"edge indices out of range [0, {num_nodes})")
        if x is not None and not isinstance(x, jax.core.Tracer) and \
                np.asarray(x).shape[0] != num_nodes:
            raise ValueError(
                f"x has {np.asarray(x).shape[0]} rows, expected "
                f"{num_nodes}")

    # Fast path: plain weighted gather-sum == SpMM.
    if message_fn is None and spmm_op is not None and aggr in ("add", "sum"):
        w = edge_weight if edge_weight is not None else \
            graph.real_edge_mask().astype(x.dtype)
        return spmm_op(w, x)

    x_j = jnp.take(x, graph.senders, axis=0)
    if message_fn is not None:
        x_i = jnp.take(x_dst if x_dst is not None else x,
                       graph.receivers, axis=0)
        msg = message_fn(x_j, x_i, graph.edge_attr)
    else:
        msg = x_j
    if edge_weight is not None:
        w = edge_weight.reshape(
            edge_weight.shape + (1,) * (msg.ndim - edge_weight.ndim))
        msg = msg * w
    if aggr in ("mean", "max", "min") and graph.edge_mask is not None:
        # Exclude padding edges from order statistics / counts.  (For sums
        # padding edges land on the padding node and are harmless, but
        # only when edge targets are padded correctly; masking costs one
        # select and keeps mean/max exact.)
        m = graph.edge_mask.reshape(
            graph.edge_mask.shape + (1,) * (msg.ndim - 1))
        if aggr == "mean":
            msg = jnp.where(m, msg, 0.0)
            out = scatter(msg, graph.receivers, num_nodes, reduce="sum",
                          indices_are_sorted=graph.edges_sorted)
            cnt = scatter(graph.edge_mask.astype(msg.dtype), graph.receivers,
                          num_nodes, reduce="sum",
                          indices_are_sorted=graph.edges_sorted)
            cnt = jnp.maximum(cnt, 1.0)
            return out / cnt.reshape((-1,) + (1,) * (msg.ndim - 1))
        big = jnp.asarray(jnp.finfo(msg.dtype).max, msg.dtype)
        fill = -big if aggr == "max" else big
        msg = jnp.where(m, msg, fill)
        out = scatter(msg, graph.receivers, num_nodes, reduce=aggr,
                      indices_are_sorted=graph.edges_sorted)
        return jnp.where(jnp.abs(out) >= big, 0.0, out)
    return scatter(msg, graph.receivers, num_nodes, reduce=aggr,
                   indices_are_sorted=graph.edges_sorted)
