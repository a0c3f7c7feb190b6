"""Locality-aware node reordering.

TPU SpMM kernels (ops/spmm.py windowed one-hot) win when edges
concentrate in few (src-window, dst-window) buckets.  Real graphs have
community structure; RCM (reverse Cuthill–McKee) bandwidth minimisation
re-labels nodes so neighbours get nearby ids, densifying the window
buckets (measured: XLA's gather itself is locality-insensitive — this
exists purely for the blocked MXU kernels; see PERF.md).
"""

from typing import Tuple

import numpy as np
import scipy.sparse as sp


def rcm_permutation(senders, receivers, num_nodes: int) -> np.ndarray:
    """perm[new_id] = old_id via reverse Cuthill–McKee."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    adj = sp.coo_matrix(
        (np.ones(len(senders)), (senders, receivers)),
        shape=(num_nodes, num_nodes))
    adj = adj + adj.T
    return np.asarray(sp.csgraph.reverse_cuthill_mckee(adj.tocsr(),
                                                       symmetric_mode=True))


def reorder_graph(data, perm: np.ndarray = None):
    """Relabel a host Data's nodes by ``perm`` (new->old).  Reorders x,
    pos, y (node-level), masks, and edge endpoints."""
    if perm is None:
        perm = rcm_permutation(data.edge_index[0], data.edge_index[1],
                               data.num_nodes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    n = data.num_nodes
    for key, value in list(data(*[])):
        if key == "edge_index":
            continue
        if data.is_node_level(key, value):
            setattr(data, key, value[perm])
    data.edge_index = inv[data.edge_index]
    return data


def window_density(senders, receivers, num_nodes: int,
                   window: int = 256) -> Tuple[int, float]:
    """(non-empty buckets, mean edges per non-empty bucket) — the packing
    efficiency metric for the windowed kernel."""
    sw = np.asarray(senders) // window
    dw = np.asarray(receivers) // window
    nw = -(-num_nodes // window)
    key = dw * nw + sw
    uniq, counts = np.unique(key, return_counts=True)
    return len(uniq), float(counts.mean())
