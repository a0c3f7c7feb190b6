"""Block-diagonal collation with static-shape padding.

The reference's ``DataLoader`` collates k graphs into one disconnected
graph plus a ``batch`` vector (reference: examples/mutag_gin.py:14-15) —
with *dynamic* total sizes, which would force an XLA recompile per batch.
Here collation additionally pads node/edge/graph counts to **bucketed
budgets** so the number of distinct compiled shapes stays O(log sizes):

- padding nodes are appended after real nodes (masked out via
  ``node_mask``), and all padding edges are self-loops on the first
  padding node, so segment ops route their contributions harmlessly into
  padding rows;
- padding nodes belong to a dedicated padding *graph* (the last graph id),
  keeping global poolings per real graph exact;
- edges are sorted by receiver so segment reductions take the sorted
  fast path, and edge-level features are permuted consistently.
"""

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.graph import Graph

# Geometric bucket ladder: powers of two interleaved with 1.5x, so padding
# waste is <= 33% while distinct shapes grow logarithmically.
def bucket_size(n: int, minimum: int = 16) -> int:
    if n <= minimum:
        return minimum
    b = minimum
    while True:
        if n <= b:
            return b
        if n <= b + b // 2:
            return b + b // 2
        b *= 2


def collate(
    data_list: Sequence[Data],
    num_nodes: Optional[int] = None,
    num_edges: Optional[int] = None,
    num_graphs: Optional[int] = None,
    follow_keys: Optional[List[str]] = None,
    sort_edges: bool = True,
) -> Graph:
    """Collate host ``Data`` records into one padded device ``Graph``."""
    G = len(data_list)
    tot_n = sum(d.num_nodes for d in data_list)
    tot_e = sum(d.num_edges for d in data_list)
    # Budgets: always >= one padding node (edge padding target) and one
    # padding graph (padding nodes' segment).
    N = num_nodes if num_nodes is not None else bucket_size(tot_n + 1)
    E = num_edges if num_edges is not None else bucket_size(max(tot_e, 1))
    GB = num_graphs if num_graphs is not None else G + 1
    if N <= tot_n:
        raise ValueError(f"num_nodes budget {N} <= total real nodes {tot_n} "
                         "(need >= 1 padding node)")
    if E < tot_e:
        raise ValueError(f"num_edges budget {E} < total real edges {tot_e}")
    if GB <= G:
        raise ValueError(f"num_graphs budget {GB} <= {G} "
                         "(need >= 1 padding graph)")

    senders = np.full(E, tot_n, dtype=np.int32)   # pad edges -> pad node
    receivers = np.full(E, tot_n, dtype=np.int32)
    edge_mask = np.zeros(E, dtype=bool)
    node_mask = np.zeros(N, dtype=bool)
    node_mask[:tot_n] = True
    batch = np.full(N, GB - 1, dtype=np.int32)    # pad nodes -> pad graph

    node_off = 0
    edge_off = 0
    node_fields, edge_fields, graph_fields = {}, {}, {}
    for gid, d in enumerate(data_list):
        n, e = d.num_nodes, d.num_edges
        if d.edge_index is not None and e:
            senders[edge_off:edge_off + e] = d.edge_index[0] + node_off
            receivers[edge_off:edge_off + e] = d.edge_index[1] + node_off
            edge_mask[edge_off:edge_off + e] = True
        batch[node_off:node_off + n] = gid
        for key, value in d:
            if key in ("edge_index", "face"):
                continue
            # node-index-valued fields (host-precomputed cluster maps)
            # must be offset like edge_index
            if key.startswith("cluster"):
                value = value + node_off
            if key == "y":
                is_node = value.ndim > 0 and value.shape[:1] == (n,) \
                    and n != G
                (node_fields if is_node else graph_fields).setdefault(
                    key, []).append(value)
            elif d.is_edge_level(key, value):
                edge_fields.setdefault(key, []).append(value)
            elif d.is_node_level(key, value):
                node_fields.setdefault(key, []).append(value)
            else:
                graph_fields.setdefault(key, []).append(value)
        node_off += n
        edge_off += e

    def pad_cat(chunks, total, fill=0):
        cat = np.concatenate([np.atleast_1d(c) for c in chunks], axis=0)
        pad_rows = total - cat.shape[0]
        if pad_rows > 0:
            pad = np.full((pad_rows,) + cat.shape[1:], fill, dtype=cat.dtype)
            cat = np.concatenate([cat, pad], axis=0)
        return cat

    node_arrays = {k: pad_cat(v, N) for k, v in node_fields.items()}
    edge_arrays = {k: pad_cat(v, E) for k, v in edge_fields.items()}
    graph_arrays = {}
    for k, v in graph_fields.items():
        stacked = [np.atleast_1d(np.asarray(c)) for c in v]
        if all(c.shape == stacked[0].shape for c in stacked):
            arr = np.stack(stacked, axis=0) if stacked[0].ndim == 0 or \
                stacked[0].shape[0] != 1 else np.concatenate(stacked, axis=0)
        else:
            arr = np.concatenate(stacked, axis=0)
        pad_rows = GB - arr.shape[0]
        if pad_rows > 0:
            pad = np.zeros((pad_rows,) + arr.shape[1:], dtype=arr.dtype)
            arr = np.concatenate([arr, pad], axis=0)
        graph_arrays[k] = arr

    if sort_edges:
        order = np.argsort(receivers, kind="stable")
        senders, receivers = senders[order], receivers[order]
        edge_mask = edge_mask[order]
        edge_arrays = {k: v[order] for k, v in edge_arrays.items()}

    x = node_arrays.pop("x", None)
    pos = node_arrays.pop("pos", None)
    y = node_arrays.pop("y", None)
    if y is None:
        y = graph_arrays.pop("y", None)
    edge_attr = edge_arrays.pop("edge_attr", None)

    extras = {}
    for k, v in {**node_arrays, **edge_arrays, **graph_arrays}.items():
        extras[k] = jnp.asarray(v)
    extras["graph_mask"] = jnp.asarray(
        np.arange(GB) < G)

    def dev(a, dtype=None):
        if a is None:
            return None
        a = np.asarray(a)
        if dtype is None and a.dtype == np.float64:
            dtype = np.float32
        if dtype is None and a.dtype == np.int64:
            dtype = np.int32
        return jnp.asarray(a if dtype is None else a.astype(dtype))

    return Graph(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        x=dev(x), edge_attr=dev(edge_attr), pos=dev(pos), y=dev(y),
        node_mask=jnp.asarray(node_mask), edge_mask=jnp.asarray(edge_mask),
        batch=jnp.asarray(batch), extras=extras,
        num_graphs=GB, edges_sorted=sort_edges,
    )


def from_data(data: Data, num_nodes=None, num_edges=None,
              sort_edges: bool = True) -> Graph:
    """Collate a single graph (transductive workloads: Cora et al.)."""
    return collate([data], num_nodes=num_nodes, num_edges=num_edges,
                   sort_edges=sort_edges)
