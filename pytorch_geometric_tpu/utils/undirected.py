"""Undirected-graph helpers (host/loader-time; reference:
torch_geometric.utils.to_undirected used by dataset processing)."""

import numpy as np


def to_undirected(senders, receivers, num_nodes=None):
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    n = num_nodes or (int(max(senders.max(), receivers.max())) + 1
                      if senders.size else 0)
    s = np.concatenate([senders, receivers])
    r = np.concatenate([receivers, senders])
    key = s.astype(np.int64) * n + r
    _, first = np.unique(key, return_index=True)
    return s[first], r[first]


def is_undirected(senders, receivers, num_nodes=None) -> bool:
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    n = num_nodes or (int(max(senders.max(), receivers.max())) + 1
                      if senders.size else 0)
    fwd = set((senders.astype(np.int64) * n + receivers).tolist())
    bwd = set((receivers.astype(np.int64) * n + senders).tolist())
    return fwd == bwd
