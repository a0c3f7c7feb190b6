"""Transform suite tests."""

import numpy as np

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.transforms import (
    AddSelfLoops,
    Cartesian,
    Center,
    Compose,
    Constant,
    Distance,
    FaceToEdge,
    NormalizeFeatures,
    NormalizeScale,
    OneHotDegree,
    SamplePoints,
    TargetIndegree,
    ToDense,
)


def test_normalize_features():
    d = Data(x=np.array([[1.0, 3.0], [0.0, 0.0], [2.0, 2.0]]))
    d = NormalizeFeatures()(d)
    np.testing.assert_allclose(d.x.sum(axis=1), [1.0, 0.0, 1.0])


def test_cartesian_distance():
    pos = np.array([[0.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    ei = np.array([[0, 1], [1, 0]])
    d = Cartesian()(Data(edge_index=ei, pos=pos))
    assert d.edge_attr.shape == (2, 2)
    np.testing.assert_allclose(d.edge_attr[0], [1.0, 0.5])  # norm to [0,1]
    d2 = Distance()(Data(edge_index=ei, pos=pos))
    np.testing.assert_allclose(d2.edge_attr[:, 0], [1.0, 1.0])


def test_target_indegree_and_cat():
    ei = np.array([[0, 1, 2], [1, 1, 0]])
    d = Data(edge_index=ei, x=np.zeros((3, 2), np.float32))
    d = TargetIndegree()(d)
    np.testing.assert_allclose(d.edge_attr[:, 0], [1.0, 1.0, 0.5])
    # cat onto existing edge_attr
    d = Data(edge_index=ei, edge_attr=np.ones((3, 1), np.float32),
             x=np.zeros((3, 2), np.float32))
    d = TargetIndegree()(d)
    assert d.edge_attr.shape == (3, 2)


def test_face_to_edge_and_sample_points():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                   dtype=np.float32)
    face = np.array([[0, 1], [1, 2], [2, 3]])
    d = FaceToEdge()(Data(pos=pos, face=face,
                          num_nodes_hint=np.zeros(4)))
    assert d.face is None
    s, r = d.edge_index
    assert ((s < 4) & (r < 4)).all()
    # each face edge present both directions
    pairs = set(zip(s.tolist(), r.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs

    d2 = SamplePoints(32)(Data(pos=pos, face=face))
    assert d2.pos.shape == (32, 3)
    assert (d2.pos[:, 2] == 0).all()
    assert d2.pos.min() >= -1e-6 and d2.pos.max() <= 1 + 1e-6


def test_normalize_scale():
    pos = np.array([[0.0, 10.0], [0.0, -10.0], [4.0, 0.0]])
    d = NormalizeScale()(Data(pos=pos))
    assert np.abs(d.pos).max() <= 1.0


def test_to_dense():
    ei = np.array([[0, 1], [1, 2]])
    d = Data(x=np.ones((3, 2), np.float32), edge_index=ei, y=np.int64(1))
    out = ToDense(5)(d)
    assert out.x.shape == (5, 2)
    assert out.adj.shape == (5, 5)
    assert out.mask.sum() == 3
    assert out.adj[1, 0] == 1.0 and out.adj[2, 1] == 1.0


def test_constant_selfloops_onehotdegree():
    ei = np.array([[0, 0, 1], [1, 2, 2]])
    d = Data(edge_index=ei, x=np.zeros((3, 1), np.float32))
    d = Constant()(d)
    assert d.x.shape == (3, 2)
    d = AddSelfLoops()(d)
    assert d.num_edges == 6
    d2 = OneHotDegree(3)(Data(edge_index=ei,
                              num_nodes_hint=np.zeros(3)))
    assert d2.x.shape == (3, 4)
    np.testing.assert_allclose(d2.x[0], [0, 0, 1, 0])  # out-degree 2


def test_compose():
    ei = np.array([[0, 1], [1, 0]])
    pos = np.array([[0.0, 0.0], [1.0, 1.0]], dtype=np.float32)
    t = Compose([Cartesian(), Distance()])
    d = t(Data(edge_index=ei, pos=pos))
    assert d.edge_attr.shape == (2, 3)
