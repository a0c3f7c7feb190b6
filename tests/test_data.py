"""Data core: Data record, collation/padding, loaders, datasets."""

import numpy as np

from pytorch_geometric_tpu.data import (
    Data,
    DataLoader,
    DataListLoader,
    collate,
    from_data,
)
from pytorch_geometric_tpu.datasets.synthetic import (
    synthetic_citation_graph,
    synthetic_graph_classification,
)


def make_graph(rng, n, e, f=4):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return Data(x=rng.normal(size=(n, f)).astype(np.float32),
                edge_index=ei, y=np.int64(rng.integers(0, 3)))


def test_data_record(rng):
    d = make_graph(rng, 10, 30)
    assert d.num_nodes == 10
    assert d.num_edges == 30
    assert d.num_node_features == 4
    keys = dict(d(*[]))
    assert set(keys) == {"x", "edge_index", "y"}


def test_collate_block_diagonal(rng):
    graphs = [make_graph(rng, 5, 12), make_graph(rng, 7, 20),
              make_graph(rng, 3, 6)]
    g = collate(graphs)
    assert g.num_graphs == 4  # 3 real + 1 padding graph
    nm = np.asarray(g.node_mask)
    em = np.asarray(g.edge_mask)
    assert nm.sum() == 15
    assert em.sum() == 38
    batch = np.asarray(g.batch)
    assert (np.bincount(batch[nm], minlength=3)[:3] == [5, 7, 3]).all()
    # real edges stay within their graph
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    assert (batch[s[em]] == batch[r[em]]).all()
    # padding edges point at a padding node
    assert (~nm[s[~em]]).all()
    # graph-level y padded to num_graphs
    assert np.asarray(g.y).shape[0] == 4
    # receivers sorted for fast segment path
    assert (np.diff(r) >= 0).all()


def test_collate_node_level_fields(rng):
    d = synthetic_citation_graph("cora", seed=1)
    g = from_data(d)
    assert np.asarray(g.x).shape[0] == g.num_nodes
    tm = np.asarray(g.extras["train_mask"])
    assert tm.shape[0] == g.num_nodes
    assert tm.sum() == 20 * 7
    # attribute passthrough
    assert g.train_mask is g.extras["train_mask"]


def test_dataloader_single_shape(rng):
    datas = synthetic_graph_classification(23, 20, 8, 2, seed=0)
    loader = DataLoader(datas, batch_size=8, shuffle=True)
    shapes = set()
    total = 0
    for g in loader:
        shapes.add((g.num_nodes, g.num_edges, g.num_graphs))
        total += int(np.asarray(g.extras["graph_mask"]).sum())
    assert len(shapes) == 1  # one compiled shape per loader
    assert total == 23


def test_datalist_loader(rng):
    datas = synthetic_graph_classification(10, 15, 4, 2, seed=1)
    loader = DataListLoader(datas, batch_size=4)
    batches = list(loader)
    assert [len(b) for b in batches] == [4, 4, 2]


def test_dataset_shuffle_slice():
    datas = synthetic_graph_classification(12, 10, 4, 3, seed=2)

    class ListDS(list):
        pass

    from pytorch_geometric_tpu.data.dataset import InMemoryDataset

    ds = InMemoryDataset()
    ds.data_list = datas
    assert len(ds) == 12
    assert ds.num_classes == 3
    sh = ds.shuffle(seed=0)
    assert len(sh) == 12
    sub = sh[:5]
    assert len(sub) == 5


def test_dataloader_dynamic_buckets(rng):
    sizes = [4, 6, 40, 35, 5, 38]
    datas = []
    for n in sizes:
        e = n * 2
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        datas.append(Data(x=rng.normal(size=(n, 4)).astype(np.float32),
                          edge_index=ei, y=np.int64(0)))
    loader = DataLoader(datas, batch_size=2, dynamic_buckets=True)
    shapes = [(g.num_nodes, g.num_edges) for g in loader]
    # small batches pad to smaller rungs than the worst-case budget
    assert min(s[0] for s in shapes) < max(s[0] for s in shapes)
    total = sum(int(np.asarray(g.node_mask).sum()) for g in
                DataLoader(datas, batch_size=2, dynamic_buckets=True))
    assert total == sum(sizes)
