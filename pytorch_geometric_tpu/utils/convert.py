"""Sparse <-> dense conversions (reference: ToDense transform and
dense_diff_pool's input format, examples/enzymes_diff_pool.py)."""

import jax.numpy as jnp


def _local_positions(batch):
    """Local index of each node within its graph (batch must group
    nodes by graph, as the block-diagonal collater produces)."""
    n = batch.shape[0]
    order = jnp.argsort(batch, stable=True)
    inv = jnp.argsort(order, stable=True)
    sorted_batch = batch[order]
    idx_in_graph = jnp.arange(n) - jnp.searchsorted(
        sorted_batch, sorted_batch, side="left")
    return idx_in_graph[inv]


def to_dense_adj(senders, receivers, batch=None, edge_weight=None,
                 num_nodes=None, max_num_nodes=None, edge_mask=None,
                 num_graphs=None):
    """Build dense adjacency.  Single graph: (N, N).  Batched: (G, M, M)
    using per-graph local indices (padding edges must be masked).

    Shape arguments are static: inside ``jit``, ``num_nodes`` (single
    graph), and ``num_graphs`` + ``max_num_nodes`` (batched), MUST be
    passed as Python ints — omitting them falls back to ``int(.max())``
    on the traced index arrays, which raises a ConcretizationError
    under tracing.  The fallbacks exist for eager/host-side use only.
    """
    if batch is None and num_nodes is None:
        num_nodes = (int(max(senders.max(), receivers.max())) + 1
                     if senders.size else 0)
    if edge_weight is None:
        edge_weight = jnp.ones(senders.shape, dtype=jnp.float32)
    if edge_mask is not None:
        edge_weight = jnp.where(edge_mask, edge_weight, 0.0)
    if batch is None:
        n = num_nodes
        adj = jnp.zeros((n, n), dtype=edge_weight.dtype)
        return adj.at[senders, receivers].add(edge_weight)
    if num_graphs is None:
        num_graphs = int(batch.max()) + 1
    pos = _local_positions(batch)
    m = max_num_nodes if max_num_nodes is not None \
        else int(pos.max()) + 1
    g = jnp.take(batch, receivers)
    pr = jnp.take(pos, receivers)
    ps = jnp.take(pos, senders)
    valid = (pr < m) & (ps < m)
    w = jnp.where(valid, edge_weight, 0.0)
    pr = jnp.minimum(pr, m - 1)
    ps = jnp.minimum(ps, m - 1)
    # same convention as the single-graph branch: adj[g, sender, recv]
    adj = jnp.zeros((num_graphs, m, m), dtype=edge_weight.dtype)
    return adj.at[g, ps, pr].add(w)


def to_dense_batch(x, batch, num_graphs, max_num_nodes, node_mask=None):
    """Scatter node features into (G, M, F) + (G, M) mask."""
    import jax
    n = x.shape[0]
    # position of each node within its graph
    ones = jnp.ones((n,), dtype=jnp.int32)
    if node_mask is not None:
        ones = jnp.where(node_mask, ones, 0)
    # cumulative count per graph: stable position index
    order = jnp.argsort(batch, stable=True)
    inv = jnp.argsort(order, stable=True)
    sorted_batch = batch[order]
    idx_in_graph = jnp.arange(n) - jnp.searchsorted(
        sorted_batch, sorted_batch, side="left")
    pos = idx_in_graph[inv]
    out = jnp.zeros((num_graphs, max_num_nodes) + x.shape[1:], x.dtype)
    mask = jnp.zeros((num_graphs, max_num_nodes), dtype=bool)
    valid = pos < max_num_nodes
    if node_mask is not None:
        valid = valid & node_mask
    safe_pos = jnp.where(valid, pos, max_num_nodes - 1)
    out = out.at[batch, safe_pos].set(
        jnp.where(valid.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0.0))
    mask = mask.at[batch, safe_pos].max(valid)
    return out, mask
