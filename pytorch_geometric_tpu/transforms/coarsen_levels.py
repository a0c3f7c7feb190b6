"""Host-precomputed graclus coarsening levels.

The reference coarsens *inside* forward (graclus on normalized-cut
weights derived from pos, examples/mnist_graclus.py:36-46) — dynamic
shapes every step.  Because those weights depend only on geometry (pos),
the whole coarsening hierarchy is precomputable per sample at transform
time (SURVEY §7.5: host-side coarsening producing new buckets).  Each
level k stores a ``cluster{k}`` node field mapping node -> representative
node id (same id space, so batching offsets apply uniformly); the device
side applies them with ``pool_graph_masked`` at static shapes.
"""

import numpy as np

from pytorch_geometric_tpu.cluster import graclus_cluster


def _normalized_cut_np(senders, receivers, pos, num_nodes):
    d = np.linalg.norm(pos[senders] - pos[receivers], axis=1)
    deg = np.bincount(receivers, minlength=num_nodes).astype(np.float64)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    return d * (inv[senders] + inv[receivers])


class PrecomputeGraclusCoarsening:
    """Adds cluster1..clusterL node fields (rep-node-id maps)."""

    def __init__(self, levels: int = 2, seed: int = 0):
        self.levels = levels
        self.seed = seed

    def __call__(self, data):
        n = data.num_nodes
        s, r = data.edge_index[0].copy(), data.edge_index[1].copy()
        pos = data.pos.astype(np.float64)
        # rep[i]: current representative of original node i
        rep = np.arange(n, dtype=np.int64)
        for level in range(1, self.levels + 1):
            w = _normalized_cut_np(s, r, pos, n)
            cl = graclus_cluster(s, r, w, num_nodes=n,
                                 seed=self.seed + level)
            # only current representatives matter; map all originals
            rep = cl[rep]
            setattr(data, f"cluster{level}", rep.copy())
            # coarsen host graph (keep original id space: id = rep id)
            s, r = cl[s], cl[r]
            keep = s != r
            s, r = s[keep], r[keep]
            key = s * n + r
            _, first = np.unique(key, return_index=True)
            s, r = s[first], r[first]
            # pooled pos = mean over members (indexed at rep ids)
            cnt = np.zeros(n)
            acc = np.zeros_like(pos)
            np.add.at(cnt, rep, 1.0)
            np.add.at(acc, rep, data.pos.astype(np.float64))
            pos = np.where(cnt[:, None] > 0,
                           acc / np.maximum(cnt, 1.0)[:, None], pos)
        return data

    def __repr__(self):
        return f"PrecomputeGraclusCoarsening(levels={self.levels})"
