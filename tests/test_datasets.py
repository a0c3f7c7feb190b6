"""Dataset suite: offline synthetic fallbacks produce canonical shapes
and cache correctly."""

import numpy as np
import pytest

from pytorch_geometric_tpu.datasets import (
    Amazon,
    Entities,
    FAUST,
    MNISTSuperpixels,
    ModelNet,
    Planetoid,
    PPI,
    QM9,
    Reddit,
    TUDataset,
)


def test_planetoid_cora_shapes(tmp_path):
    ds = Planetoid(str(tmp_path), "Cora")
    assert len(ds) == 1
    d = ds[0]
    assert d.x.shape == (2708, 1433)
    assert d.num_features == 1433
    assert ds.num_classes == 7
    assert d.train_mask.sum() == 140
    assert d.val_mask.sum() == 500
    assert d.test_mask.sum() == 1000
    # reload hits the processed cache
    ds2 = Planetoid(str(tmp_path), "Cora")
    np.testing.assert_array_equal(ds2[0].edge_index, d.edge_index)


def test_tudataset_enzymes(tmp_path):
    ds = TUDataset(str(tmp_path), "ENZYMES")
    assert len(ds) == 600
    assert ds.num_classes == 6
    sizes = {len(np.unique(d.edge_index)) for d in ds[:10]}
    assert all(s > 3 for s in sizes)
    # slicing + shuffle
    sub = ds.shuffle(seed=0)[:100]
    assert len(sub) == 100


def test_tudataset_real_format_parsing(tmp_path):
    # write a tiny real-format TU dataset and parse it
    raw = tmp_path / "TINY" / "raw"
    raw.mkdir(parents=True)
    (raw / "TINY_A.txt").write_text("1, 2\n2, 1\n3, 4\n4, 3\n")
    (raw / "TINY_graph_indicator.txt").write_text("1\n1\n2\n2\n")
    (raw / "TINY_graph_labels.txt").write_text("1\n-1\n")
    (raw / "TINY_node_labels.txt").write_text("0\n1\n1\n0\n")
    ds = TUDataset(str(tmp_path), "TINY")
    assert len(ds) == 2
    assert ds.num_classes == 2
    d0 = ds[0]
    assert d0.num_nodes == 2
    assert d0.edge_index.tolist() == [[0, 1], [1, 0]]
    np.testing.assert_array_equal(d0.x, [[1, 0], [0, 1]])


def test_ppi_splits(tmp_path):
    tr = PPI(str(tmp_path), "train")
    va = PPI(str(tmp_path), "val")
    assert len(tr) == 20 and len(va) == 2
    d = tr[0]
    assert d.x.shape[1] == 50
    assert d.y.shape[1] == 121
    assert set(np.unique(d.y)) <= {0.0, 1.0}


def test_reddit_amazon(tmp_path):
    r = Reddit(str(tmp_path))
    d = r[0]
    assert d.x.shape[1] == 602
    assert d.y.max() < 41
    assert d.train_mask.sum() > 0
    a = Amazon(str(tmp_path), "Photo")
    assert a[0].x.shape == (7650, 745)


def test_qm9(tmp_path):
    ds = QM9(str(tmp_path), num_synthetic=50)
    assert len(ds) == 50
    d = ds[0]
    assert d.y.shape == (1, 19)
    assert d.edge_attr.shape[1] == 4
    assert d.pos.shape[1] == 3
    # reference mutates dataset.data.y in place (qm9_nn_conv.py:55-57)
    y = ds.data.y
    assert y.shape == (50, 19)
    ds.data.y = y * 2.0
    np.testing.assert_allclose(ds[0].y, d.y)  # same object, mutated


def test_entities(tmp_path):
    ds = Entities(str(tmp_path), "MUTAG")
    d = ds[0]
    assert ds.num_relations == 46
    assert d.edge_type.max() < 46
    assert len(d.train_idx) > 0 and len(d.test_idx) > 0
    assert set(d.y[d.train_idx]) <= {0, 1}


def test_mnist_superpixels(tmp_path):
    ds = MNISTSuperpixels(str(tmp_path), train=True, num_synthetic=60)
    assert len(ds) == 60
    d = ds[0]
    assert d.pos.shape == (75, 2)
    assert d.x.shape == (75, 1)


def test_faust_modelnet(tmp_path):
    f = FAUST(str(tmp_path), train=True)
    assert len(f) == 80
    d = f[0]
    assert d.face.shape[0] == 3
    assert d.y.shape[0] == d.num_nodes
    m = ModelNet(str(tmp_path), "10", train=False, samples_per_class=4)
    assert len(m) == 10 * 2
    assert m[0].pos.shape[1] == 3
