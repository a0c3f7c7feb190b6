"""Pooling layer tests: global readouts, TopK, Set2Set, DiffPool,
graclus coarsening."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.data import Data, collate
from pytorch_geometric_tpu.nn.pool import (
    Set2Set,
    TopKPooling,
    dense_diff_pool,
    global_add_pool,
    global_max_pool,
    global_mean_pool,
    graclus,
    max_pool,
    max_pool_x,
    topk_mask,
)


def make_batch(rng, sizes, f=6):
    datas = []
    for n in sizes:
        e = n * 2
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        datas.append(Data(x=rng.normal(size=(n, f)).astype(np.float32),
                          edge_index=ei, y=np.int64(0)))
    return datas, collate(datas)


def test_global_pools_exact(rng):
    datas, g = make_batch(rng, [5, 8, 3])
    for fn, ref in [(global_add_pool, np.sum), (global_mean_pool, np.mean),
                    (global_max_pool, np.max)]:
        out = np.asarray(fn(g.x, g))
        for i, d in enumerate(datas):
            np.testing.assert_allclose(out[i], ref(d.x, axis=0), rtol=1e-5,
                                       atol=1e-5)


def test_topk_mask_per_graph(rng):
    datas, g = make_batch(rng, [10, 6])
    score = jnp.asarray(rng.normal(size=g.num_nodes).astype(np.float32))
    keep = np.asarray(topk_mask(score, g, ratio=0.5))
    batch = np.asarray(g.batch)
    nm = np.asarray(g.node_mask)
    s_np = np.asarray(score)
    for i, n in enumerate([10, 6]):
        sel = keep & (batch == i)
        k = int(np.ceil(0.5 * n))
        assert sel.sum() == k
        # selected scores are the top-k of that graph
        mine = np.sort(s_np[sel])[::-1]
        truth = np.sort(s_np[nm & (batch == i)])[::-1][:k]
        np.testing.assert_allclose(mine, truth)
    assert not keep[~nm].any()


def test_topk_pooling_module(rng):
    datas, g = make_batch(rng, [10, 6])
    pool = TopKPooling(in_channels=6, ratio=0.5)
    params = pool.init(jax.random.PRNGKey(0), g, g.x)
    g2, gated, score = pool.apply(params, g, g.x)
    assert np.asarray(g2.node_mask).sum() == 5 + 3
    em = np.asarray(g2.edge_mask)
    s, r = np.asarray(g2.senders), np.asarray(g2.receivers)
    nm2 = np.asarray(g2.node_mask)
    assert nm2[s[em]].all() and nm2[r[em]].all()
    # dropped nodes produce zero rows
    assert (np.asarray(gated)[~nm2] == 0).all()


def test_set2set_shapes(rng):
    datas, g = make_batch(rng, [5, 7])
    s2s = Set2Set(in_channels=6, processing_steps=3)
    params = s2s.init(jax.random.PRNGKey(0), g.x, g)
    out = s2s.apply(params, g.x, g)
    assert out.shape == (g.num_graphs, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_dense_diff_pool_matches_manual(rng):
    B, N, F, C = 2, 7, 5, 3
    x = rng.normal(size=(B, N, F)).astype(np.float32)
    adj = (rng.random((B, N, N)) < 0.3).astype(np.float32)
    s = rng.normal(size=(B, N, C)).astype(np.float32)
    xo, ao, ll, el = dense_diff_pool(jnp.asarray(x), jnp.asarray(adj),
                                     jnp.asarray(s))
    sm = np.exp(s) / np.exp(s).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(xo),
                               np.einsum("bnc,bnf->bcf", sm, x), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ao), np.einsum("bnc,bnm,bmd->bcd", sm, adj, sm),
        rtol=1e-4)
    assert float(ll) >= 0 and float(el) >= 0


def test_graclus_max_pool_host(rng):
    n, e = 12, 30
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    d = Data(x=rng.normal(size=(n, 4)).astype(np.float32), edge_index=ei,
             pos=rng.random((n, 2)).astype(np.float32))
    cl = graclus(ei[0], ei[1], num_nodes=n)
    out = max_pool(cl, d)
    k = len(np.unique(cl))
    assert out.x.shape == (k, 4)
    assert out.pos.shape == (k, 2)
    # pooled x = max over members
    uniq = np.unique(cl)
    for i, c in enumerate(uniq):
        np.testing.assert_allclose(out.x[i], d.x[cl == c].max(axis=0),
                                   rtol=1e-6)
    # no self loops in pooled edges
    assert (out.edge_index[0] != out.edge_index[1]).all()


def test_max_pool_x_device(rng):
    x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    cluster = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    batch = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    out, pb = max_pool_x(cluster, x, batch, num_clusters=4)
    np.testing.assert_allclose(np.asarray(out)[0],
                               np.asarray(x)[:2].max(axis=0), rtol=1e-6)
    assert np.asarray(pb).tolist() == [0, 0, 1, 1]
