"""Cluster layer: native C++ kernels vs numpy fallbacks vs invariants."""

import numpy as np
import pytest

from pytorch_geometric_tpu import cluster as C
from pytorch_geometric_tpu.cluster import _native


def test_native_lib_builds():
    assert _native.get_lib() is not None, "native graphcore must build"


def test_graclus_valid_matching(rng):
    n, e = 50, 200
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    # symmetrise (graclus expects undirected adjacency)
    s2 = np.concatenate([s, r])
    r2 = np.concatenate([r, s])
    w = rng.random(2 * e)
    cl = C.graclus_cluster(s2, r2, w, num_nodes=n)
    assert cl.shape == (n,)
    # every cluster has size 1 or 2, and cluster id = min member
    sizes = {}
    for i, c in enumerate(cl):
        sizes.setdefault(int(c), []).append(i)
    for c, members in sizes.items():
        assert len(members) <= 2
        assert c == min(members)
        if len(members) == 2:
            a, b = members
            # matched nodes must be adjacent
            adj = ((s2 == a) & (r2 == b)) | ((s2 == b) & (r2 == a))
            assert adj.any()


def test_voxel_grid_cells(rng):
    pos = rng.random((100, 2)) * 10
    cl = C.voxel_grid(pos, size=2.5)
    assert cl.shape == (100,)
    # points in the same cell are within cell diameter
    for c in np.unique(cl):
        pts = pos[cl == c]
        assert (pts.max(axis=0) - pts.min(axis=0)).max() <= 2.5 + 1e-9
    # matches numpy fallback
    lib = _native._lib
    try:
        _native._lib = None
        cl2 = C.voxel_grid(pos, size=2.5)
    finally:
        _native._lib = lib
    np.testing.assert_array_equal(cl, cl2)


def test_fps_coverage(rng):
    pos = rng.random((64, 3))
    idx = C.fps(pos, ratio=0.25, random_start=False)
    assert len(idx) == 16
    assert len(set(idx.tolist())) == 16
    # batched: respects segments
    batch = np.repeat([0, 1], 32)
    idx = C.fps(pos, batch=batch, ratio=0.5, random_start=False)
    assert (batch[idx] == np.repeat([0, 1], 16)).all()


def test_radius_and_knn(rng):
    x = rng.random((80, 2))
    y = rng.random((10, 2))
    row, col = C.radius(x, y, r=0.3, max_num_neighbors=100)
    d = np.linalg.norm(x[col] - y[row], axis=1)
    assert (d <= 0.3 + 1e-9).all()
    # knn: exact distances vs brute force
    row, col = C.knn(x, y, k=5)
    assert row.shape[0] == 50
    for i in range(10):
        mine = np.sort(np.linalg.norm(x[col[row == i]] - y[i], axis=1))
        truth = np.sort(np.linalg.norm(x - y[i], axis=1))[:5]
        np.testing.assert_allclose(mine, truth, rtol=1e-9)


def test_coalesce(rng):
    s = np.array([3, 1, 1, 2, 1])
    r = np.array([0, 2, 2, 0, 2])
    a = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    s2, r2, a2 = C.coalesce_edges(s, r, a, num_nodes=4)
    assert s2.tolist() == [2, 3, 1]
    assert r2.tolist() == [0, 0, 2]
    np.testing.assert_allclose(a2, [4.0, 1.0, 10.0])


def test_sample_neighbors(rng):
    # chain graph CSR over receivers: node v has in-nbrs [v-1, v+1]
    n = 20
    indptr = [0]
    indices = []
    for v in range(n):
        nb = [u for u in (v - 1, v + 1) if 0 <= u < n]
        indices.extend(nb)
        indptr.append(len(indices))
    src, dst = C.sample_neighbors(indptr, indices, seeds=[0, 5, 19], k=1)
    assert len(src) == 3
    for s_, d_ in zip(src, dst):
        assert abs(s_ - d_) == 1
