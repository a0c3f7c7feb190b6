"""Planetoid citation datasets: Cora / CiteSeer / PubMed.

Reference counterpart: ``torch_geometric.datasets.Planetoid``
(reference usage: ConvexPruning.py:459; examples/gcn.py:11-13).

Resolution order:
1. processed cache under ``<root>/<name>/processed``;
2. raw Planetoid files (``ind.<name>.{x,tx,allx,y,ty,ally,graph,test.index}``)
   if present (same on-disk format as the reference's loader);
3. best-effort download (github planetoid mirror);
4. deterministic synthetic fallback with canonical shapes (air-gapped
   environments) — flagged via ``dataset.is_synthetic``.
"""

import os.path as osp
import pickle
import sys
import warnings

import numpy as np

from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.dataset import InMemoryDataset, makedirs
from pytorch_geometric_tpu.datasets.synthetic import synthetic_citation_graph

_URL = "https://github.com/kimiyoung/planetoid/raw/master/data"
_PARTS = ["x", "tx", "allx", "y", "ty", "ally", "graph", "test.index"]


class Planetoid(InMemoryDataset):

    def __init__(self, root, name, transform=None, pre_transform=None):
        self.name = name.lower()
        self.is_synthetic = False
        super().__init__(osp.join(root, name), transform, pre_transform)

    @property
    def raw_file_names(self):
        return [f"ind.{self.name}.{p}" for p in _PARTS]

    def download(self):
        import urllib.request
        try:
            for part in _PARTS:
                fname = f"ind.{self.name}.{part}"
                urllib.request.urlretrieve(
                    f"{_URL}/{fname}", osp.join(self.raw_dir, fname))
        except Exception as exc:  # air-gapped: synthesise instead
            warnings.warn(
                f"Planetoid({self.name}): download unavailable ({exc}); "
                "using deterministic synthetic graph with canonical shapes.")
            self.is_synthetic = True
            makedirs(self.raw_dir)
            with open(osp.join(self.raw_dir, "SYNTHETIC"), "w") as f:
                f.write("1")

    def _maybe_download(self):
        from pytorch_geometric_tpu.data.dataset import files_exist
        if files_exist(self.raw_paths):
            return
        if osp.exists(osp.join(self.raw_dir, "SYNTHETIC")):
            self.is_synthetic = True
            return
        makedirs(self.raw_dir)
        self.download()

    def process_full(self):
        if self.is_synthetic or osp.exists(
                osp.join(self.raw_dir, "SYNTHETIC")):
            self.is_synthetic = True
            return [synthetic_citation_graph(self.name)]
        return [self._parse_planetoid()]

    def _parse_planetoid(self) -> Data:
        objs = {}
        for part in _PARTS[:-1]:
            path = osp.join(self.raw_dir, f"ind.{self.name}.{part}")
            with open(path, "rb") as f:
                if sys.version_info > (3, 0):
                    objs[part] = pickle.load(f, encoding="latin1")
                else:
                    objs[part] = pickle.load(f)
        test_idx = np.loadtxt(
            osp.join(self.raw_dir, f"ind.{self.name}.test.index"),
            dtype=np.int64)

        x, tx, allx = (np.asarray(objs[k].todense(), dtype=np.float32)
                       for k in ("x", "tx", "allx"))
        y, ty, ally = (np.asarray(objs[k]) for k in ("y", "ty", "ally"))
        test_sorted = np.sort(test_idx)

        if self.name == "citeseer":
            # citeseer has isolated test nodes missing from tx; re-insert.
            full = np.arange(test_sorted[0], test_sorted[-1] + 1)
            tx_ext = np.zeros((len(full), tx.shape[1]), dtype=np.float32)
            tx_ext[test_sorted - test_sorted[0]] = tx
            ty_ext = np.zeros((len(full), ty.shape[1]), dtype=ty.dtype)
            ty_ext[test_sorted - test_sorted[0]] = ty
            tx, ty, test_idx_used = tx_ext, ty_ext, full
        else:
            test_idx_used = test_sorted

        # Canonical planetoid reordering: test rows of allx||tx are stored
        # contiguously after allx but belong at positions test_idx_used.
        features = np.vstack([allx, tx])
        labels = np.vstack([ally, ty])
        features = _reorder(features, test_idx_used, allx.shape[0])
        labels = _reorder(labels, test_idx_used, ally.shape[0])

        y_int = labels.argmax(axis=1).astype(np.int64)
        n = features.shape[0]

        graph = objs["graph"]
        rows, cols = [], []
        for src, nbrs in graph.items():
            rows.extend([src] * len(nbrs))
            cols.extend(nbrs)
        ei = np.stack([np.asarray(rows, dtype=np.int64),
                       np.asarray(cols, dtype=np.int64)])
        # undirected + dedup + no self loops
        ei = np.concatenate([ei, ei[::-1]], axis=1)
        ei = ei[:, ei[0] != ei[1]]
        key = ei[0] * n + ei[1]
        _, first = np.unique(key, return_index=True)
        ei = ei[:, first]

        train_mask = np.zeros(n, dtype=bool)
        train_mask[: y.shape[0]] = True
        val_mask = np.zeros(n, dtype=bool)
        val_mask[y.shape[0]: y.shape[0] + 500] = True
        test_mask = np.zeros(n, dtype=bool)
        test_mask[test_idx] = True

        return Data(x=features, edge_index=ei, y=y_int,
                    train_mask=train_mask, val_mask=val_mask,
                    test_mask=test_mask)


def _reorder(mat, test_idx, offset):
    out = mat.copy()
    out[test_idx] = mat[offset: offset + len(test_idx)]
    return out


class CoraFull(InMemoryDataset):
    """CoraFull (reference: ConvexPruning.py:474) — synthetic fallback
    offline; real npz parsing when ``cora_full.npz`` is provided."""

    def __init__(self, root, transform=None, pre_transform=None):
        self.is_synthetic = False
        super().__init__(osp.join(root, "corafull"), transform,
                         pre_transform)

    @property
    def raw_file_names(self):
        return ["cora_full.npz"]

    def download(self):
        warnings.warn("CoraFull: no offline source; using synthetic "
                      "fallback with canonical shapes.")
        self.is_synthetic = True
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
            return [synthetic_citation_graph("corafull")]
        with np.load(self.raw_paths[0], allow_pickle=True) as f:
            import scipy.sparse as sp
            adj = sp.csr_matrix((f["adj_data"], f["adj_indices"],
                                 f["adj_indptr"]), shape=f["adj_shape"])
            attr = sp.csr_matrix((f["attr_data"], f["attr_indices"],
                                  f["attr_indptr"]), shape=f["attr_shape"])
            x = np.asarray(attr.todense(), dtype=np.float32)
            y = f["labels"].astype(np.int64)
            coo = adj.tocoo()
            ei = np.stack([coo.row, coo.col]).astype(np.int64)
        return [Data(x=x, edge_index=ei, y=y)]
