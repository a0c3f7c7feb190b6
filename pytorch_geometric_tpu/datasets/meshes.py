"""Mesh / point-cloud datasets: FAUST, ModelNet.

Reference counterparts: ``FAUST`` (examples/faust.py:25 — 100 human
meshes, 10 subjects x 10 poses, 6890 vertices, correspondence targets),
``ModelNet`` ('10'/'40'; examples/pointnet++.py:13 — CAD meshes sampled
to point clouds).
"""

import os.path as osp
import warnings

import numpy as np

from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.dataset import InMemoryDataset, makedirs
from pytorch_geometric_tpu.datasets.molecules import _OfflineSynthetic


def _sphere_mesh(n_theta, n_phi, rng, jitter=0.0):
    """Deterministic UV-sphere triangle mesh."""
    thetas = np.linspace(0.15, np.pi - 0.15, n_theta)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for t in thetas:
        for p in phis:
            verts.append([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                          np.cos(t)])
    pos = np.asarray(verts, dtype=np.float32)
    if jitter:
        pos = pos + rng.normal(0, jitter, pos.shape).astype(np.float32)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append([a, b, c])
            faces.append([b, d, c])
    return pos, np.asarray(faces, dtype=np.int64).T


class FAUST(_OfflineSynthetic):
    """100 registered human scans; target = vertex correspondence id
    (examples/faust.py trains per-vertex classification over 6890
    classes).  Offline: deformed sphere meshes with per-vertex identity
    targets, vertex count scaled to 684 (6890/10) by default."""

    def __init__(self, root, train: bool = True, transform=None,
                 pre_transform=None, pre_filter=None,
                 num_vertices: int = 684):
        self.train = train
        self.num_vertices = num_vertices
        self.is_synthetic = False
        super().__init__(osp.join(root, "faust",
                                  "train" if train else "test"),
                         transform, pre_transform, pre_filter)

    @property
    def raw_file_names(self):
        return ["MPI-FAUST.zip"]

    def process_full(self):
        if not osp.exists(self.raw_paths[0]):
            self.is_synthetic = True
            rng = np.random.default_rng(3 if self.train else 4)
            count = 80 if self.train else 20
            n_theta = max(int(np.sqrt(self.num_vertices / 2)), 4)
            n_phi = 2 * n_theta
            out = []
            for i in range(count):
                pos, face = _sphere_mesh(n_theta, n_phi, rng,
                                         jitter=0.02 * (i % 10))
                n = pos.shape[0]
                out.append(Data(pos=pos, face=face,
                                y=np.arange(n, dtype=np.int64)))
            return out
        # real MPI-FAUST.zip: 100 PLY registrations, first 80 train /
        # last 20 test (PyG split), target = vertex id
        from pytorch_geometric_tpu.datasets.io import (
            iter_zip_members,
            read_ply,
        )
        plys = [(n, b) for n, b in
                iter_zip_members(self.raw_paths[0], ".ply")
                if "registrations" in n and "tr_reg_" in n]
        plys = plys[:80] if self.train else plys[80:100]
        out = []
        for _, blob in plys:
            pos, face = read_ply(blob)
            out.append(Data(pos=pos, face=face,
                            y=np.arange(pos.shape[0], dtype=np.int64)))
        return out


class ModelNet(_OfflineSynthetic):
    """ModelNet10/40 CAD meshes (examples/pointnet++.py:13).  Offline:
    parametric shape families (sphere/box/cylinder-ish) per class."""

    def __init__(self, root, name: str = "10", train: bool = True,
                 transform=None, pre_transform=None, pre_filter=None,
                 samples_per_class: int = 40):
        assert name in ("10", "40")
        self.name = name
        self.train = train
        self.samples_per_class = samples_per_class if train else \
            max(samples_per_class // 4, 2)
        self.is_synthetic = False
        super().__init__(osp.join(root, f"modelnet{name}",
                                  "train" if train else "test"),
                         transform, pre_transform, pre_filter)

    @property
    def raw_file_names(self):
        return [f"ModelNet{self.name}.zip"]

    def process_full(self):
        if not osp.exists(self.raw_paths[0]):
            self.is_synthetic = True
            c = int(self.name)
            rng = np.random.default_rng(13 if self.train else 14)
            out = []
            for y in range(c):
                # class-specific anisotropic scaling of a sphere mesh
                scale = 0.3 + rng.random(3) * (1 + y / c)
                for _ in range(self.samples_per_class):
                    pos, face = _sphere_mesh(8, 16, rng, jitter=0.01)
                    p = pos * scale.astype(np.float32)
                    out.append(Data(pos=p, face=face, y=np.int64(y)))
            return out
        # real ModelNet{10,40}.zip: <class>/<train|test>/*.off
        from pytorch_geometric_tpu.datasets.io import (
            iter_zip_members,
            read_off,
        )
        split = "train" if self.train else "test"
        classes = sorted({m.split("/")[-3]
                          for m, _ in iter_zip_members(
                              self.raw_paths[0], ".off")
                          if f"/{split}/" in m})
        cls_idx = {c: i for i, c in enumerate(classes)}
        out = []
        for name, blob in iter_zip_members(self.raw_paths[0], ".off"):
            if f"/{split}/" not in name:
                continue
            pos, face = read_off(blob.decode("ascii", errors="ignore"))
            out.append(Data(pos=pos, face=face,
                            y=np.int64(cls_idx[name.split("/")[-3]])))
        return out
