"""Large single-graph corpora: Reddit, Amazon (Computers/Photo).

Reference counterparts: ``torch_geometric.datasets.Reddit``
(ConvexPruning.py:505), ``Amazon`` (ConvexPruning.py:510).

Offline fallbacks generate planted-partition graphs.  Reddit's canonical
shape (233k nodes x 602 features, 114M directed edges) is impractical to
fabricate at full size in CI, so the synthetic fallback defaults to a
1/8-scale graph with matching degree/feature statistics; pass
``full_scale=True`` for canonical node counts (bench machines).
"""

import os.path as osp
import warnings

import numpy as np

from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.dataset import InMemoryDataset, makedirs


def _planted_graph(n, e_per_node, f, c, seed, label_dtype=np.int64):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, size=n)
    e = n * e_per_node
    src = rng.integers(0, n, size=e)
    # 70% homophile edges via sorted-by-label trick (cheap at scale):
    # partner = random node with nearby label rank
    order = np.argsort(labels, kind="stable")
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[order] = np.arange(n)
    jitter = rng.integers(-max(n // c // 2, 1), max(n // c // 2, 1),
                          size=e)
    dst_rank = np.clip(rank_of[src] + jitter, 0, n - 1)
    dst = order[dst_rank]
    rand = rng.random(e) > 0.7
    dst[rand] = rng.integers(0, n, size=int(rand.sum()))
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ei = np.stack([np.concatenate([src, dst]),
                   np.concatenate([dst, src])])
    x = rng.normal(size=(n, f)).astype(np.float32)
    x += np.eye(c, dtype=np.float32)[labels] @ \
        rng.normal(size=(c, f)).astype(np.float32) * 0.5
    return ei, x, labels.astype(label_dtype)


class Reddit(InMemoryDataset):
    N_FULL, F, C = 232965, 602, 41

    def __init__(self, root, transform=None, pre_transform=None,
                 full_scale: bool = False):
        self.full_scale = full_scale
        self.is_synthetic = False
        super().__init__(osp.join(root, "reddit"), transform,
                         pre_transform)

    @property
    def raw_file_names(self):
        return ["reddit_data.npz", "reddit_graph.npz"]

    def download(self):
        warnings.warn("Reddit: no network; synthetic planted-partition "
                      "fallback.")
        self.is_synthetic = True
        makedirs(self.raw_dir)
        with open(osp.join(self.raw_dir, "SYNTHETIC"), "w") as f:
            f.write("1")

    def _maybe_download(self):
        from pytorch_geometric_tpu.data.dataset import files_exist
        if files_exist(self.raw_paths) or \
                osp.exists(osp.join(self.raw_dir, "SYNTHETIC")):
            return
        makedirs(self.raw_dir)
        self.download()

    def process_full(self):
        if not osp.exists(self.raw_paths[0]):
            self.is_synthetic = True
            n = self.N_FULL if self.full_scale else self.N_FULL // 8
            ei, x, y = _planted_graph(n, 25, self.F, self.C, seed=7)
            rng = np.random.default_rng(8)
            split = rng.random(n)
            return [Data(x=x, edge_index=ei, y=y,
                         train_mask=split < 0.66,
                         val_mask=(split >= 0.66) & (split < 0.76),
                         test_mask=split >= 0.76)]
        import scipy.sparse as sp
        data = np.load(self.raw_paths[0])
        adj = sp.load_npz(self.raw_paths[1]).tocoo()
        ei = np.stack([adj.row, adj.col]).astype(np.int64)
        split = data["node_types"]
        return [Data(x=data["feature"].astype(np.float32),
                     edge_index=ei,
                     y=data["label"].astype(np.int64),
                     train_mask=split == 1, val_mask=split == 2,
                     test_mask=split == 3)]


class Amazon(InMemoryDataset):
    SHAPES = {"computers": (13752, 767, 10), "photo": (7650, 745, 8)}

    def __init__(self, root, name, transform=None, pre_transform=None):
        self.name = name.lower()
        assert self.name in self.SHAPES
        self.is_synthetic = False
        super().__init__(osp.join(root, "amazon", self.name), transform,
                         pre_transform)

    @property
    def raw_file_names(self):
        return [f"amazon_electronics_{self.name}.npz"]

    def download(self):
        warnings.warn(f"Amazon({self.name}): no network; synthetic "
                      "fallback.")
        self.is_synthetic = True
        makedirs(self.raw_dir)
        with open(osp.join(self.raw_dir, "SYNTHETIC"), "w") as f:
            f.write("1")

    def _maybe_download(self):
        from pytorch_geometric_tpu.data.dataset import files_exist
        if files_exist(self.raw_paths) or \
                osp.exists(osp.join(self.raw_dir, "SYNTHETIC")):
            return
        makedirs(self.raw_dir)
        self.download()

    def process_full(self):
        n, f, c = self.SHAPES[self.name]
        if not osp.exists(self.raw_paths[0]):
            self.is_synthetic = True
            ei, x, y = _planted_graph(n, 18, f, c, seed=11)
            return [Data(x=x, edge_index=ei, y=y)]
        import scipy.sparse as sp
        with np.load(self.raw_paths[0], allow_pickle=True) as fz:
            adj = sp.csr_matrix((fz["adj_data"], fz["adj_indices"],
                                 fz["adj_indptr"]),
                                shape=fz["adj_shape"]).tocoo()
            attr = sp.csr_matrix((fz["attr_data"], fz["attr_indices"],
                                  fz["attr_indptr"]),
                                 shape=fz["attr_shape"])
            x = np.asarray(attr.todense(), dtype=np.float32)
            y = fz["labels"].astype(np.int64)
        ei = np.stack([adj.row, adj.col]).astype(np.int64)
        return [Data(x=x, edge_index=ei, y=y)]
