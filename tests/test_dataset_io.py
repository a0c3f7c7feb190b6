"""Real raw-format parsing paths (OFF / PLY / torch .pt) exercised via
generated fixture archives — no network needed."""

import os
import os.path as osp
import struct
import zipfile

import numpy as np
import pytest

from pytorch_geometric_tpu.datasets.io import (
    read_off,
    read_ply,
)


def _tet():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                   np.float32)
    face = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]],
                    np.int64)
    return pos, face


def _off_bytes(pos, face):
    lines = [f"OFF", f"{len(pos)} {len(face)} 0"]
    lines += [" ".join(f"{v:.4f}" for v in p) for p in pos]
    lines += ["3 " + " ".join(str(i) for i in f) for f in face]
    return ("\n".join(lines) + "\n").encode()


def _ply_ascii_bytes(pos, face):
    h = ["ply", "format ascii 1.0",
         f"element vertex {len(pos)}",
         "property float x", "property float y", "property float z",
         f"element face {len(face)}",
         "property list uchar int vertex_indices", "end_header"]
    body = [" ".join(f"{v:.4f}" for v in p) for p in pos]
    body += ["3 " + " ".join(str(i) for i in f) for f in face]
    return ("\n".join(h + body) + "\n").encode()


def _ply_binary_bytes(pos, face):
    h = ("ply\nformat binary_little_endian 1.0\n"
         f"element vertex {len(pos)}\n"
         "property float x\nproperty float y\nproperty float z\n"
         f"element face {len(face)}\n"
         "property list uchar int vertex_indices\nend_header\n")
    blob = h.encode()
    blob += pos.astype("<f4").tobytes()
    for f in face:
        blob += struct.pack("<B", 3) + np.asarray(f, "<i4").tobytes()
    return blob


def test_read_off_and_ply_roundtrip():
    pos, face = _tet()
    p2, f2 = read_off(_off_bytes(pos, face).decode())
    np.testing.assert_allclose(p2, pos, atol=1e-4)
    np.testing.assert_array_equal(f2, face.T)
    for blob in (_ply_ascii_bytes(pos, face),
                 _ply_binary_bytes(pos, face)):
        p3, f3 = read_ply(blob)
        np.testing.assert_allclose(p3, pos, atol=1e-4)
        np.testing.assert_array_equal(f3, face.T)


def test_modelnet_real_zip(tmp_path):
    from pytorch_geometric_tpu.datasets import ModelNet

    pos, face = _tet()
    raw_dir = tmp_path / "modelnet10" / "train" / "raw"
    os.makedirs(raw_dir)
    with zipfile.ZipFile(raw_dir / "ModelNet10.zip", "w") as zf:
        for cls in ("bed", "chair"):
            for split in ("train", "test"):
                for i in range(2):
                    zf.writestr(
                        f"ModelNet10/{cls}/{split}/{cls}_{i}.off",
                        _off_bytes(pos * (1 + i), face))
    ds = ModelNet(str(tmp_path), "10", train=True)
    assert not ds.is_synthetic
    assert len(ds) == 4
    ys = sorted(int(d.y) for d in ds)
    assert ys == [0, 0, 1, 1]
    assert ds[0].pos.shape == (4, 3)


def test_faust_real_zip(tmp_path):
    from pytorch_geometric_tpu.datasets import FAUST

    pos, face = _tet()
    raw_dir = tmp_path / "faust" / "train" / "raw"
    os.makedirs(raw_dir)
    with zipfile.ZipFile(raw_dir / "MPI-FAUST.zip", "w") as zf:
        for i in range(100):
            zf.writestr(
                f"MPI-FAUST/training/registrations/tr_reg_{i:03d}.ply",
                _ply_binary_bytes(pos + 0.01 * i, face))
    ds = FAUST(str(tmp_path), train=True)
    assert not ds.is_synthetic
    assert len(ds) == 80
    assert ds[0].pos.shape == (4, 3)
    assert list(ds[0].y) == [0, 1, 2, 3]


def test_mnist_superpixels_real_pt(tmp_path):
    torch = pytest.importorskip("torch")
    from pytorch_geometric_tpu.datasets import MNISTSuperpixels

    m, n = 3, 75
    x = torch.rand(m * n, 1)
    pos = torch.rand(m * n, 2)
    y = torch.tensor([1, 7, 3])
    eis, slices = [], [0]
    for i in range(m):
        e = 4 * n
        src = torch.randint(0, n, (e,)) + i * n   # global convention
        dst = torch.randint(0, n, (e,)) + i * n
        eis.append(torch.stack([src, dst]))
        slices.append(slices[-1] + e)
    edge_index = torch.cat(eis, dim=1)
    raw_dir = tmp_path / "mnist_superpixels" / "train" / "raw"
    os.makedirs(raw_dir)
    torch.save((x, edge_index, torch.tensor(slices), pos, y),
               raw_dir / "training.pt")
    ds = MNISTSuperpixels(str(tmp_path), train=True)
    assert not ds.is_synthetic
    assert len(ds) == 3
    d = ds[0]
    assert d.x.shape == (75, 1) and d.pos.shape == (75, 2)
    assert int(np.asarray(d.edge_index).max()) < 75
    assert [int(g.y) for g in ds] == [1, 7, 3]
