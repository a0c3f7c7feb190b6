"""SplineConv basis/conv and PointConv tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.cluster import fps, radius
from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import PointConv, SplineConv, spline_basis


def test_spline_basis_partition_of_unity(rng):
    E, D = 40, 2
    pseudo = jnp.asarray(rng.random((E, D)).astype(np.float32))
    w, idx = spline_basis(pseudo, [5, 5], [1, 1])
    assert w.shape == (E, 4) and idx.shape == (E, 4)
    np.testing.assert_allclose(np.asarray(w).sum(axis=1), 1.0, rtol=1e-5)
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 25).all()


def test_spline_basis_grid_corners():
    # pseudo exactly on a grid point -> single support weight 1
    pseudo = jnp.asarray([[0.0], [1.0], [0.5]])
    w, idx = spline_basis(pseudo, [3], [1])
    w, idx = np.asarray(w), np.asarray(idx)
    # u=0 -> cell 0 weight 1; u=1 -> cell 2 weight 1; u=.5 -> cell 1 w 1
    got = {}
    for e in range(3):
        for s in range(2):
            if w[e, s] > 1e-6:
                got.setdefault(e, []).append((idx[e, s], w[e, s]))
    assert got[0] == [(0, 1.0)]
    assert got[1] == [(2, 1.0)]
    assert got[2] == [(1, 1.0)]


def test_spline_conv_matches_dense(rng):
    n, e, f, c = 15, 40, 4, 3
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    pseudo = rng.random((e, 2)).astype(np.float32)
    g = from_data(Data(x=rng.normal(size=(n, f)).astype(np.float32),
                       edge_index=ei, edge_attr=pseudo))
    conv = SplineConv(out_channels=c, dim=2, kernel_size=3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))

    w, idx = spline_basis(g.edge_attr, [3, 3], [1, 1])
    w, idx = np.asarray(w), np.asarray(idx)
    W = np.asarray(params["params"]["weight"])      # (9, f, c)
    root = np.asarray(params["params"]["root"])
    bias = np.asarray(params["params"]["bias"])
    x = np.asarray(g.x)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    em = np.asarray(g.real_edge_mask())
    want = x @ root + bias
    for eid in np.flatnonzero(em):
        m = np.zeros((f, c))
        for sp in range(4):
            m += w[eid, sp] * W[idx[eid, sp]]
        want[r[eid]] += x[s[eid]] @ m
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-3, atol=1e-3)


def test_point_conv_set_abstraction(rng):
    from flax import linen as nn

    n = 32
    pos = rng.random((n, 3)).astype(np.float32)
    x = rng.normal(size=(n, 5)).astype(np.float32)
    idx = fps(pos, ratio=0.25, random_start=False)
    row, col = radius(pos, pos[idx], r=0.5, max_num_neighbors=16)
    conv = PointConv(local_nn=nn.Dense(8))
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       (jnp.asarray(pos), jnp.asarray(pos[idx])),
                       jnp.asarray(col), jnp.asarray(row), len(idx))
    out = conv.apply(params, jnp.asarray(x),
                     (jnp.asarray(pos), jnp.asarray(pos[idx])),
                     jnp.asarray(col), jnp.asarray(row), len(idx))
    assert out.shape == (len(idx), 8)
    assert np.isfinite(np.asarray(out)).all()


def test_spline_basis_higher_degrees_partition_of_unity(rng):
    """Degree 1-3 bases must sum to 1 per edge (B-spline partition of
    unity), be non-negative, and stay within the kernel grid."""
    import jax.numpy as jnp

    from pytorch_geometric_tpu.nn.conv.spline_conv import spline_basis

    E, D = 200, 2
    pseudo = jnp.asarray(rng.random((E, D)).astype("float32"))
    for degree in (1, 2, 3):
        for open_ in ((1, 1), (0, 0)):
            ks = (5, 6)
            w, idx = spline_basis(pseudo, jnp.asarray(ks),
                                  jnp.asarray(open_), degree)
            assert w.shape == (E, (degree + 1) ** D)
            np.testing.assert_allclose(np.asarray(w.sum(1)),
                                       np.ones(E), rtol=1e-5)
            assert float(w.min()) >= -1e-6
            assert int(idx.min()) >= 0 and int(idx.max()) < 30


def test_spline_conv_degree2_trains(rng):
    import jax
    import jax.numpy as jnp

    from pytorch_geometric_tpu.data import Data, from_data
    from pytorch_geometric_tpu.nn.conv.spline_conv import SplineConv

    n, e = 20, 60
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ea = rng.random((e, 2)).astype("float32")
    g = from_data(Data(x=rng.normal(size=(n, 4)).astype("float32"),
                       edge_index=ei, edge_attr=ea))
    conv = SplineConv(out_channels=3, dim=2, kernel_size=4, degree=2)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = conv.apply(params, g, g.x)
    assert np.isfinite(np.asarray(out)).all()
    grads = jax.grad(
        lambda p: jnp.sum(conv.apply(p, g, g.x) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
