"""Molecular / relational / vision datasets: QM9, Entities,
MNISTSuperpixels.

Reference counterparts: ``QM9`` (examples/qm9_nn_conv.py:52 — 19
regression targets, edge_attr bond types), ``Entities`` (examples/
rgcn.py:11 — MUTAG-RDF relational graph, train/test triple indices),
``MNISTSuperpixels`` (ConvexPruning.py:515; examples/mnist_graclus.py —
75-node superpixel graphs with pos).
"""

import os.path as osp
import warnings

import numpy as np

from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.dataset import InMemoryDataset, makedirs


class _OfflineSynthetic(InMemoryDataset):
    """Shared machinery for datasets whose offline path is synthetic."""

    def download(self):
        warnings.warn(f"{self.__class__.__name__}: no network; "
                      "deterministic synthetic fallback.")
        self.is_synthetic = True
        makedirs(self.raw_dir)
        with open(osp.join(self.raw_dir, "SYNTHETIC"), "w") as f:
            f.write("1")

    def _maybe_download(self):
        # any one raw format suffices (real archives come in several)
        if any(osp.exists(p) for p in self.raw_paths) or \
                osp.exists(osp.join(self.raw_dir, "SYNTHETIC")):
            return
        makedirs(self.raw_dir)
        self.download()


class QM9(_OfflineSynthetic):
    """~130k molecules; synthetic fallback defaults to 8k samples with
    canonical per-sample shapes (5 atom features, 4 bond types, 19
    targets)."""

    def __init__(self, root, transform=None, pre_transform=None,
                 pre_filter=None, num_synthetic: int = 8000):
        self.num_synthetic = num_synthetic
        self.is_synthetic = False
        super().__init__(osp.join(root, "qm9"), transform, pre_transform,
                         pre_filter)

    @property
    def raw_file_names(self):
        return ["qm9.npz", "dsgdb9nsd.xyz.tar.bz2"]

    def process_full(self):
        if osp.exists(self.raw_paths[1]):
            # the canonical GDB-9 release: one .xyz per molecule
            # (reference dataset of examples/qm9_nn_conv.py:52)
            from pytorch_geometric_tpu.datasets.io import (
                iter_tar_members,
                qm9_distance_bonds,
                read_qm9_xyz,
            )
            out = []
            for _, blob in iter_tar_members(self.raw_paths[1], ".xyz"):
                x, pos, y = read_qm9_xyz(blob)
                ei, ea = qm9_distance_bonds(pos)
                out.append(Data(x=x, edge_index=ei, edge_attr=ea,
                                pos=pos, y=y))
            return out
        if not osp.exists(self.raw_paths[0]):
            self.is_synthetic = True
            rng = np.random.default_rng(17)
            out = []
            for i in range(self.num_synthetic):
                n = int(rng.integers(4, 30))
                # chain + random extra bonds (molecule-like sparsity)
                s = np.arange(n - 1)
                r = s + 1
                extra = max(n // 4, 1)
                es = rng.integers(0, n, extra)
                er = rng.integers(0, n, extra)
                keep = es != er
                s = np.concatenate([s, es[keep]])
                r = np.concatenate([r, er[keep]])
                ei = np.stack([np.concatenate([s, r]),
                               np.concatenate([r, s])])
                key = ei[0] * n + ei[1]
                _, first = np.unique(key, return_index=True)
                ei = ei[:, first]
                bond = rng.integers(0, 4, ei.shape[1])
                ea = np.eye(4, dtype=np.float32)[bond]
                x = rng.normal(size=(n, 5)).astype(np.float32)
                pos = rng.normal(size=(n, 3)).astype(np.float32)
                y = rng.normal(size=(1, 19)).astype(np.float32)
                # make target 0 learnable: mean feature + size effect
                y[0, 0] = x.mean() + 0.05 * n
                out.append(Data(x=x, edge_index=ei, edge_attr=ea, pos=pos,
                                y=y))
            return out
        with np.load(self.raw_paths[0], allow_pickle=True) as fz:
            return list(fz["data_list"])


class Entities(_OfflineSynthetic):
    """Relational entity graphs (RDF).  Offline: MUTAG-RDF-shaped
    synthetic (23644 entities scaled to 1/8, 46 relations, 2 classes,
    train/test splits over labelled nodes)."""

    SHAPES = {"mutag": (23644, 46, 2, 340),
              "aifb": (8285, 45, 4, 176)}

    def __init__(self, root, name, transform=None, pre_transform=None,
                 scale: float = 0.125):
        self.name = name.lower()
        assert self.name in self.SHAPES
        self.scale = scale
        self.is_synthetic = False
        super().__init__(osp.join(root, "entities", self.name), transform,
                         pre_transform)

    # TSV (entity column, label column) per corpus — the split-file
    # schema of the RDF entity-classification release
    TSV_COLS = {"mutag": ("bond", "label_mutagenic"),
                "aifb": ("person", "label_affiliation")}

    @property
    def raw_file_names(self):
        return [f"{self.name}.npz", f"{self.name}.tgz"]

    @property
    def num_relations(self):
        return self.SHAPES[self.name][1]

    @property
    def num_classes(self):
        return self.SHAPES[self.name][2]

    def process_full(self):
        n_full, R, C, n_lab = self.SHAPES[self.name]
        if osp.exists(self.raw_paths[1]):
            # real RDF release: <name>.tgz with <name>_stripped.nt.gz
            # + trainingSet.tsv / testSet.tsv (reference
            # examples/rgcn.py:11 Entities semantics)
            import gzip

            from pytorch_geometric_tpu.datasets.io import (
                iter_tar_members,
                parse_entities_rdf,
            )
            nt = train_tsv = test_tsv = None
            for name, blob in iter_tar_members(self.raw_paths[1], ""):
                if name.endswith(".nt.gz"):
                    nt = gzip.decompress(blob)
                elif name.endswith(".nt"):
                    nt = blob
                elif "trainingSet" in name:
                    train_tsv = blob
                elif "testSet" in name:
                    test_tsv = blob
            ent, lab = self.TSV_COLS.get(self.name, (None, None))
            parsed = parse_entities_rdf(nt, train_tsv, test_tsv, ent,
                                        lab)
            n = parsed.pop("num_nodes")
            parsed.pop("num_relations")
            parsed.pop("num_classes")
            return [Data(num_nodes_hint=np.zeros(n, dtype=np.int8),
                         **parsed)]
        if not osp.exists(self.raw_paths[0]):
            self.is_synthetic = True
            n = max(int(n_full * self.scale), 64)
            rng = np.random.default_rng(23)
            e = n * 6
            s = rng.integers(0, n, e)
            r = rng.integers(0, n, e)
            et = rng.integers(0, R, e)
            labelled = rng.permutation(n)[:min(n_lab, n // 2)]
            y = np.full(n, -1, dtype=np.int64)
            # label correlated with a hub relation's degree parity
            deg = np.bincount(r[et == 0], minlength=n)
            y[labelled] = (deg[labelled] % C)
            split = rng.random(len(labelled))
            train_idx = labelled[split < 0.8]
            test_idx = labelled[split >= 0.8]
            return [Data(edge_index=np.stack([s, r]), edge_type=et,
                         y=y, train_idx=train_idx, test_idx=test_idx,
                         num_nodes_hint=np.zeros(n, dtype=np.int8))]
        with np.load(self.raw_paths[0], allow_pickle=True) as fz:
            return [Data(**{k: fz[k] for k in fz.files})]


class MNISTSuperpixels(_OfflineSynthetic):
    """75-node superpixel MNIST graphs (reference ConvexPruning.py:515).
    Offline: synthetic grids of 75 superpixels whose intensity pattern
    encodes the digit class (learnable)."""

    def __init__(self, root, train: bool = True, transform=None,
                 pre_transform=None, pre_filter=None,
                 num_synthetic: int = 6000):
        self.train = train
        self.num_synthetic = num_synthetic if train else num_synthetic // 6
        self.is_synthetic = False
        super().__init__(
            osp.join(root, "mnist_superpixels",
                     "train" if train else "test"),
            transform, pre_transform, pre_filter)

    @property
    def raw_file_names(self):
        return ["training.pt" if self.train else "test.pt"]

    def process_full(self):
        if not osp.exists(self.raw_paths[0]):
            self.is_synthetic = True
            rng = np.random.default_rng(5 if self.train else 6)
            out = []
            centers = rng.random((10, 4, 2)).astype(np.float32)  # digit
            for i in range(self.num_synthetic):
                y = int(rng.integers(0, 10))
                pos = rng.random((75, 2)).astype(np.float32) * 25.0
                # intensity = proximity to the digit's blob centers
                d = np.linalg.norm(
                    pos[:, None, :] / 25.0 - centers[y][None], axis=-1)
                x = np.exp(-8.0 * d.min(axis=1))[:, None] \
                    .astype(np.float32)
                x += rng.normal(0, 0.05, size=x.shape).astype(np.float32)
                from pytorch_geometric_tpu.cluster import knn_graph
                s, r = knn_graph(pos, k=8)
                out.append(Data(x=x, edge_index=np.stack([s, r]), pos=pos,
                                y=np.int64(y)))
            return out
        # real PyG raw file: torch-saved (x, edge_index, edge_slice,
        # pos, y) with 75 nodes per graph (PyG 1.x MNISTSuperpixels)
        from pytorch_geometric_tpu.datasets.io import load_torch_tuple
        x, edge_index, edge_slice, pos, y = load_torch_tuple(
            self.raw_paths[0])
        m, n = int(y.shape[0]), 75
        x = x.reshape(m, n, -1).astype(np.float32)
        pos = pos.reshape(m, n, 2).astype(np.float32)
        out = []
        for i in range(m):
            lo, hi = int(edge_slice[i]), int(edge_slice[i + 1])
            ei = edge_index[:, lo:hi].astype(np.int64)
            if ei.size and ei.min() >= n * i:
                ei = ei - n * i     # global-index convention raw files
            out.append(Data(x=x[i], edge_index=ei, pos=pos[i],
                            y=np.int64(y[i])))
        return out
