"""Unit tests for the attention / edge-conditioned / relational convs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import (
    AGNNConv,
    ARMAConv,
    DNAConv,
    NNConv,
    RGCNConv,
)


def small_graph(rng, n=20, e=60, f=8, fe=None):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    kw = {}
    if fe:
        kw["edge_attr"] = rng.normal(size=(e, fe)).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return from_data(Data(x=x, edge_index=ei, **kw))


def test_agnn_rows_sum_preserved(rng):
    g = small_graph(rng)
    conv = AGNNConv()
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = conv.apply(params, g, g.x)
    assert out.shape == g.x.shape
    assert np.isfinite(np.asarray(out)).all()
    # beta trainable
    assert "beta" in params["params"]
    conv2 = AGNNConv(requires_grad=False)
    p2 = conv2.init(jax.random.PRNGKey(0), g, g.x)
    assert "beta" not in p2.get("params", {})


def test_arma_shapes_and_finite(rng):
    g = small_graph(rng)
    conv = ARMAConv(out_channels=6, num_stacks=3, num_layers=2,
                    shared_weights=True)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = conv.apply(params, g, g.x)
    assert out.shape == (g.num_nodes, 6)
    assert np.isfinite(np.asarray(out)).all()
    # K=1,T=1 ARMA == act(L x W + x V) mean over 1 stack
    conv1 = ARMAConv(out_channels=4, num_stacks=1, num_layers=1)
    p1 = conv1.init(jax.random.PRNGKey(1), g, g.x)
    o1 = np.asarray(conv1.apply(p1, g, g.x))
    n = g.num_nodes
    a = np.zeros((n, n))
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    em = np.asarray(g.real_edge_mask())
    np.add.at(a, (r[em], s[em]), 1.0)
    deg = a.sum(1)
    dis = np.where(deg > 0, deg ** -0.5, 0)
    lap = dis[:, None] * a * dis[None, :]
    x = np.asarray(g.x)
    w = np.asarray(p1["params"]["init_weight"][0])
    v = np.asarray(p1["params"]["root_weight"][0, 0])
    b = np.asarray(p1["params"]["bias"][0, 0, 0])
    want = np.maximum(lap @ (x @ w) + x @ v + b, 0)
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(o1[nm], want[nm], rtol=1e-4, atol=1e-4)


def test_nnconv_matches_dense(rng):
    g = small_graph(rng, fe=3)
    edge_nn = nn.Dense(8 * 5)
    conv = NNConv(out_channels=5, edge_nn=edge_nn, aggr="add")
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))

    p = params["params"]
    ea = np.asarray(g.edge_attr)
    theta = (ea @ np.asarray(p["edge_nn"]["kernel"])
             + np.asarray(p["edge_nn"]["bias"])).reshape(-1, 8, 5)
    x = np.asarray(g.x)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    em = np.asarray(g.real_edge_mask())
    want = x @ np.asarray(p["root"]) + np.asarray(p["bias"])
    acc = np.zeros((g.num_nodes, 5))
    for e in np.flatnonzero(em):
        acc[r[e]] += x[s[e]] @ theta[e]
    want = want + acc
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("num_bases", [0, 3])
def test_rgcn_matches_dense(rng, num_bases):
    n, e, f, R = 15, 50, 6, 4
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    et = rng.integers(0, R, e).astype(np.int64)
    x = rng.normal(size=(n, f)).astype(np.float32)
    g = from_data(Data(x=x, edge_index=ei, edge_type=et))
    conv = RGCNConv(in_channels=f, out_channels=5, num_relations=R,
                    num_bases=num_bases)
    params = conv.init(jax.random.PRNGKey(0), g, g.x,
                       g.extras["edge_type"])
    out = np.asarray(conv.apply(params, g, g.x, g.extras["edge_type"]))

    p = params["params"]
    basis = np.asarray(p["basis"])
    if num_bases:
        att = np.asarray(p["att"])
        W = np.einsum("rb,bfc->rfc", att, basis)
    else:
        W = basis
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    em = np.asarray(g.real_edge_mask())
    ets = np.asarray(g.extras["edge_type"])
    acc = np.zeros((g.num_nodes, 5))
    cnt = np.zeros((g.num_nodes, R))
    for eid in np.flatnonzero(em):
        cnt[r[eid], ets[eid]] += 1
    for eid in np.flatnonzero(em):
        xx = np.asarray(g.x)[s[eid]]
        acc[r[eid]] += (xx @ W[ets[eid]]) / cnt[r[eid], ets[eid]]
    want = acc + np.asarray(g.x) @ np.asarray(p["root"]) + \
        np.asarray(p["bias"])
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-3, atol=1e-3)


def test_rgcn_embedding_mode(rng):
    n, e, R = 12, 40, 3
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    et = rng.integers(0, R, e).astype(np.int64)
    g = from_data(Data(edge_index=ei, edge_type=et,
                       num_nodes_hint=np.zeros(n, dtype=np.float32)))
    # num_nodes known via the hint node field
    conv = RGCNConv(in_channels=g.num_nodes, out_channels=4,
                    num_relations=R, num_bases=2)
    params = conv.init(jax.random.PRNGKey(0), g, None,
                       g.extras["edge_type"])
    out = conv.apply(params, g, None, g.extras["edge_type"])
    assert out.shape == (g.num_nodes, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dna_conv(rng):
    n, L, C = 18, 3, 16
    ei = np.stack([rng.integers(0, n, 50), rng.integers(0, n, 50)])
    g = from_data(Data(x=np.zeros((n, 4), np.float32), edge_index=ei))
    x_all = jnp.asarray(rng.normal(size=(g.num_nodes, L, C))
                        .astype(np.float32))
    conv = DNAConv(channels=C, heads=4, groups=4)
    params = conv.init(jax.random.PRNGKey(0), g, x_all)
    out = conv.apply(params, g, x_all)
    assert out.shape == (g.num_nodes, C)
    assert np.isfinite(np.asarray(out)).all()


def test_edge_conv_matches_dense(rng):
    from pytorch_geometric_tpu.nn.conv import EdgeConv

    g = small_graph(rng)
    mlp = nn.Dense(5)
    conv = EdgeConv(mlp=mlp)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))
    p = params["params"]["mlp"]
    x = np.asarray(g.x)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    em = np.asarray(g.real_edge_mask())
    want = np.zeros((g.num_nodes, 5))
    seen = np.zeros(g.num_nodes, dtype=bool)
    for e in np.flatnonzero(em):
        m = np.concatenate([x[r[e]], x[s[e]] - x[r[e]]]) @ \
            np.asarray(p["kernel"]) + np.asarray(p["bias"])
        if not seen[r[e]]:
            want[r[e]] = m
            seen[r[e]] = True
        else:
            want[r[e]] = np.maximum(want[r[e]], m)
    nm = np.asarray(g.node_mask) & seen
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)
