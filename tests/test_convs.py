"""Per-conv unit tests: shapes, padding-invariance, and dense-reference
parity where the semantics have a clean dense form (SURVEY §4: the
upstream-style per-op unit layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import (
    ChebConv,
    DenseSAGEConv,
    GATConv,
    GCNConv,
    GINConv,
    GraphConv,
    SAGEConv,
    SGConv,
)


def small_graph(rng, n=20, e=60, f=8):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    x = rng.normal(size=(n, f)).astype(np.float32)
    return from_data(Data(x=x, edge_index=ei))


def dense_adj(graph):
    n = graph.num_nodes
    a = np.zeros((n, n))
    s = np.asarray(graph.senders)
    r = np.asarray(graph.receivers)
    em = np.asarray(graph.real_edge_mask())
    np.add.at(a, (r[em], s[em]), 1.0)
    return a


def test_gcn_matches_dense(rng):
    g = small_graph(rng)
    conv = GCNConv(out_channels=5)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))

    n = g.num_nodes
    a = dense_adj(g) + np.eye(n)
    deg = a.sum(axis=1)
    dis = np.where(deg > 0, deg ** -0.5, 0)
    a_hat = dis[:, None] * a * dis[None, :]
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    want = a_hat @ (np.asarray(g.x) @ w) + b
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)


def test_gat_rows_convex_combination(rng):
    g = small_graph(rng)
    conv = GATConv(out_channels=4, heads=3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = conv.apply(params, g, g.x)
    assert out.shape == (g.num_nodes, 12)
    assert np.isfinite(np.asarray(out)).all()
    # concat=False -> mean over heads
    conv2 = GATConv(out_channels=4, heads=3, concat=False)
    p2 = conv2.init(jax.random.PRNGKey(0), g, g.x)
    assert conv2.apply(p2, g, g.x).shape == (g.num_nodes, 4)


def test_graphconv_matches_dense(rng):
    g = small_graph(rng)
    conv = GraphConv(out_channels=6)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))
    a = dense_adj(g)
    p = params["params"]
    want = np.asarray(g.x) @ np.asarray(p["weight_root"]) + \
        (a @ np.asarray(g.x)) @ np.asarray(p["weight_nbr"]) + \
        np.asarray(p["bias"])
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)


def test_gin_matches_dense(rng):
    from flax import linen as nn

    g = small_graph(rng)
    mlp = nn.Dense(7)
    conv = GINConv(mlp=mlp, eps=0.3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))
    a = dense_adj(g)
    h = 1.3 * np.asarray(g.x) + a @ np.asarray(g.x)
    p = params["params"]["mlp"]
    want = h @ np.asarray(p["kernel"]) + np.asarray(p["bias"])
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)


def test_sage_matches_dense(rng):
    g = small_graph(rng)
    conv = SAGEConv(out_channels=5)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))
    a = dense_adj(g)
    x = np.asarray(g.x)
    mean = (a @ x + x) / (a.sum(axis=1, keepdims=True) + 1)
    p = params["params"]
    want = mean @ np.asarray(p["weight"]) + np.asarray(p["bias"])
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)


def test_cheb_matches_dense(rng):
    g = small_graph(rng)
    conv = ChebConv(out_channels=5, K=3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))
    a = dense_adj(g)
    deg = a.sum(axis=1)
    dis = np.where(deg > 0, deg ** -0.5, 0)
    lap = -(dis[:, None] * a * dis[None, :])  # L~ with lambda_max=2
    x = np.asarray(g.x)
    w = np.asarray(params["params"]["weight"])
    t0, t1 = x, lap @ x
    want = t0 @ w[0] + t1 @ w[1] + (2 * lap @ t1 - t0) @ w[2] + \
        np.asarray(params["params"]["bias"])
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)


def test_sgc_equals_stacked_gcn_propagation(rng):
    g = small_graph(rng)
    conv = SGConv(out_channels=4, K=2)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))
    n = g.num_nodes
    a = dense_adj(g) + np.eye(n)
    deg = a.sum(axis=1)
    dis = np.where(deg > 0, deg ** -0.5, 0)
    a_hat = dis[:, None] * a * dis[None, :]
    w = np.asarray(params["params"]["weight"])
    want = a_hat @ (a_hat @ np.asarray(g.x)) @ w + \
        np.asarray(params["params"]["bias"])
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)


def test_dense_sage_shapes(rng):
    B, N, F = 3, 10, 6
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    adj = jnp.asarray((rng.random((B, N, N)) < 0.2).astype(np.float32))
    conv = DenseSAGEConv(out_channels=4)
    params = conv.init(jax.random.PRNGKey(0), x, adj)
    out = conv.apply(params, x, adj)
    assert out.shape == (B, N, 4)


@pytest.mark.parametrize("conv_ctor", [
    lambda: GCNConv(out_channels=4),
    lambda: GraphConv(out_channels=4),
    lambda: SAGEConv(out_channels=4),
    lambda: ChebConv(out_channels=4, K=2),
    lambda: GATConv(out_channels=4, heads=2),
])
def test_padding_invariance(rng, conv_ctor):
    """Perturbing padded node rows must not change real outputs."""
    g = small_graph(rng)
    conv = conv_ctor()
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out1 = np.asarray(conv.apply(params, g, g.x))
    x2 = jnp.where(g.node_mask[:, None], g.x, 77.0)
    out2 = np.asarray(conv.apply(params, g, x2))
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out1[nm], out2[nm], rtol=1e-4, atol=1e-4)
