"""Cluster-based coarsening pools: graclus / voxel_grid pipelines.

Reference counterparts: ``torch_geometric.nn.graclus`` + ``max_pool`` /
``max_pool_x`` / ``avg_pool`` (reference usage:
examples/mnist_graclus.py:38-46, examples/mnist_voxel_grid.py:30-39).
The reference coarsens *inside* forward (dynamic shapes each step,
SURVEY §3.4).  TPU split:

- **host path** (`max_pool` / `avg_pool` on Data): exact reference
  semantics — relabel clusters consecutively, scatter-reduce x, mean pos,
  coalesce edges, optionally re-derive edge_attr via a transform.  Used at
  loader time to precompute coarsening levels per sample.
- **device path** (`max_pool_x` / `pool_graph_masked`): static-shape
  masked pooling for in-jit use — cluster ids live in [0, N), pooled
  tensors keep N rows with a validity mask.
"""

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.cluster import coalesce_edges, graclus_cluster
from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_sum,
)


def graclus(senders, receivers, weight=None, num_nodes=None, seed=0):
    """Reference-API alias (examples/mnist_graclus.py:39)."""
    return graclus_cluster(senders, receivers, weight, num_nodes, seed)


# --- host path -------------------------------------------------------------

def _consecutive(cluster):
    uniq, inv = np.unique(np.asarray(cluster), return_inverse=True)
    return inv.astype(np.int64), uniq.shape[0]


def _pool_data(cluster, data: Data, reduce: str,
               transform: Optional[Callable] = None) -> Data:
    cl, k = _consecutive(cluster)
    out = Data()
    if data.x is not None:
        acc = np.full((k,) + data.x.shape[1:],
                      -np.inf if reduce == "max" else 0.0, dtype=np.float64)
        if reduce == "max":
            np.maximum.at(acc, cl, data.x)
        else:
            np.add.at(acc, cl, data.x)
            cnt = np.bincount(cl, minlength=k).astype(np.float64)
            acc = acc / np.maximum(cnt, 1.0)[
                (slice(None),) + (None,) * (data.x.ndim - 1)]
        out.x = acc.astype(np.float32)
    if data.pos is not None:
        acc = np.zeros((k,) + data.pos.shape[1:], dtype=np.float64)
        np.add.at(acc, cl, data.pos)
        cnt = np.bincount(cl, minlength=k).astype(np.float64)
        out.pos = (acc / np.maximum(cnt, 1.0)[:, None]).astype(np.float32)
    if data.edge_index is not None:
        s = cl[data.edge_index[0]]
        r = cl[data.edge_index[1]]
        keep = s != r
        ea = data.edge_attr[keep] if data.edge_attr is not None else None
        s2, r2, ea2 = coalesce_edges(s[keep], r[keep], ea, num_nodes=k)
        out.edge_index = np.stack([s2, r2])
        out.edge_attr = ea2
    if getattr(data, "batch", None) is not None:
        b = np.zeros(k, dtype=np.int64)
        b[cl] = np.asarray(data.batch)
        out.batch = b
    if data.y is not None:
        out.y = data.y
    if transform is not None:
        out = transform(out)
    return out


def max_pool(cluster, data: Data, transform=None) -> Data:
    """Host coarsening: scatter-max x, mean pos, coalesced edges
    (reference max_pool, examples/mnist_graclus.py:41)."""
    return _pool_data(cluster, data, "max", transform)


def avg_pool(cluster, data: Data, transform=None) -> Data:
    return _pool_data(cluster, data, "mean", transform)


# --- device path -----------------------------------------------------------

def max_pool_x(cluster, x, batch, num_clusters: Optional[int] = None,
               node_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device segment-max of x by cluster id (reference max_pool_x,
    examples/mnist_graclus.py:46).  Static output rows = num_clusters
    (default: x rows).  Returns (pooled_x, pooled_batch)."""
    n = num_clusters if num_clusters is not None else x.shape[0]
    if node_mask is not None:
        big = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
        x = jnp.where(node_mask[:, None], x, big)
    out = segment_max(x, cluster, n)
    pooled_batch = segment_max(batch, cluster, n)
    return out, pooled_batch


def pool_graph_masked(cluster, graph: Graph, reduce: str = "max") -> Graph:
    """In-jit coarsening with static shapes: pooled graph keeps N rows;
    rows not used by any cluster are masked out, edges are relabelled to
    cluster ids with self-loop-collapsed duplicates masked off."""
    N = graph.num_nodes
    nm = graph.real_node_mask()
    cl = jnp.where(nm, cluster, N - 1).astype(jnp.int32)
    occupied = segment_sum(nm.astype(jnp.int32), cl, N) > 0

    red = {"max": segment_max, "mean": segment_mean, "add": segment_sum}
    x = None
    if graph.x is not None:
        xin = jnp.where(nm[:, None], graph.x, 0.0)
        x = red[reduce](xin, cl, N)
    pos = None
    if graph.pos is not None:
        pos = segment_mean(jnp.where(nm[:, None], graph.pos, 0.0), cl, N)
    batch = None
    if graph.batch is not None:
        batch = segment_max(graph.batch, cl, N)
    s = cl[graph.senders]
    r = cl[graph.receivers]
    ekeep = graph.real_edge_mask() & (s != r)
    return graph.replace(
        senders=s, receivers=r, x=x, pos=pos, batch=batch,
        node_mask=occupied, edge_mask=ekeep, edges_sorted=False)
