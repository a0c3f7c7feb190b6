"""Cross-framework parity, round 4 (VERDICT round 3, weak #6): the
remaining conv/pool rows vs plain-torch oracles.

Same methodology as test_torch_oracle.py / test_torch_oracle2.py: each
oracle implements the PyG 1.4.x math (reference requirement.txt:7)
directly in CPU torch with index_add_/scatter reductions, loads OUR
parameters, and compares outputs — independent framework, scatter
implementation, and reduction order.

Covers: GraphConv (reference examples/enzymes_topk_pool.py:24-28),
SGConv (examples/sgc.py:17-18), PointConv + fps/radius neighborhoods
(examples/pointnet++.py:23-50), and graclus/max_pool/max_pool_x pooled
outputs (examples/mnist_graclus.py:38-46).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pytorch_geometric_tpu.data import Data, from_data  # noqa: E402


def _graph(rng, n=40, e=160, f=8):
    ei = np.unique(np.stack([rng.integers(0, n, e),
                             rng.integers(0, n, e)]), axis=1)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return from_data(Data(x=x, edge_index=ei)), x, ei


def _scatter_add(src, index, n):
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, torch.as_tensor(index, dtype=torch.long),
                          src)


def _t(a):
    return torch.as_tensor(np.asarray(a))


@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_graphconv_vs_torch_oracle(rng, aggr):
    from pytorch_geometric_tpu.nn.conv import GraphConv

    g, x, ei = _graph(rng)
    conv = GraphConv(out_channels=5, aggr=aggr)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    ours = np.asarray(conv.apply(params, g, g.x))

    # PyG 1.4 GraphConv: out = aggr_j(x_j) W_nbr + x W_root + b
    p = params["params"]
    Wr, Wn, b = _t(p["weight_root"]), _t(p["weight_nbr"]), _t(p["bias"])
    xt = _t(x)
    n = x.shape[0]
    agg = _scatter_add(xt[ei[0]], ei[1], n)
    if aggr == "mean":
        deg = _scatter_add(torch.ones(ei.shape[1]), ei[1], n)
        agg = agg / torch.clamp(deg, min=1.0)[:, None]
    out = xt @ Wr + agg @ Wn + b
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(ours[nm][:n], out.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_sgconv_vs_torch_oracle(rng):
    from pytorch_geometric_tpu.nn.conv import SGConv

    g, x, ei = _graph(rng)
    conv = SGConv(out_channels=5, K=2)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    ours = np.asarray(conv.apply(params, g, g.x))

    # PyG 1.4 SGConv: (D^-1/2 (A+I) D^-1/2)^K x W + b
    n = x.shape[0]
    s = np.concatenate([ei[0], np.arange(n)])
    r = np.concatenate([ei[1], np.arange(n)])
    deg = np.bincount(r, minlength=n).astype(np.float64)
    dis = deg ** -0.5
    w = _t((dis[s] * dis[r]).astype(np.float32))
    h = _t(x)
    for _ in range(2):
        h = _scatter_add(h[s] * w[:, None], r, n)
    W, b = _t(params["params"]["weight"]), _t(params["params"]["bias"])
    out = h @ W + b
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(ours[nm][:n], out.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_fps_matches_greedy_oracle():
    """fps(random_start=False) == greedy farthest-point iteration
    (deterministic start at index 0 per batch) — the neighborhood-
    builder equivalence half of the PointConv parity story."""
    from pytorch_geometric_tpu.cluster import fps

    rng = np.random.default_rng(3)
    pos = rng.normal(size=(50, 3))
    batch = np.repeat([0, 1], [30, 20])
    got = fps(pos, batch, ratio=0.4, random_start=False)

    exp = []
    for gb in (0, 1):
        idx = np.flatnonzero(batch == gb)
        k = int(np.ceil(0.4 * len(idx)))
        dist = np.full(len(idx), np.inf)
        cur = 0
        for _ in range(k):
            exp.append(idx[cur])
            d2 = np.sum((pos[idx] - pos[idx[cur]]) ** 2, axis=1)
            dist = np.minimum(dist, d2)
            cur = int(np.argmax(dist))
    np.testing.assert_array_equal(np.sort(got), np.sort(exp))


def test_radius_matches_bruteforce_oracle():
    """radius() edge set == brute-force pairwise-distance filter
    (max_num_neighbors chosen above every true degree so truncation
    order cannot differ)."""
    from pytorch_geometric_tpu.cluster import radius

    rng = np.random.default_rng(4)
    x = rng.normal(size=(60, 3))
    y = x[rng.choice(60, 20, replace=False)]
    bx = np.repeat([0, 1], 30)
    by = (np.arange(20) >= 10).astype(np.int64)
    row, col = radius(x, y, 1.2, bx, by, max_num_neighbors=64)
    got = set(zip(row.tolist(), col.tolist()))

    exp = set()
    for i in range(20):
        for j in range(60):
            if bx[j] == by[i] and \
                    np.sum((x[j] - y[i]) ** 2) <= 1.2 ** 2:
                exp.add((i, j))
    assert got == exp


def test_pointconv_vs_torch_oracle(rng):
    """PointConv on an fps/radius neighborhood vs a torch oracle running
    the PyG 1.4 math (message = local_nn([x_j || p_j - p_i]), max
    aggregation, global_nn) on the SAME fixed neighborhood."""
    from flax import linen as fnn

    from pytorch_geometric_tpu.cluster import fps, radius
    from pytorch_geometric_tpu.nn.conv import PointConv

    rng2 = np.random.default_rng(11)
    n, f = 48, 6
    pos = rng2.normal(size=(n, 3)).astype(np.float32)
    x = rng2.normal(size=(n, f)).astype(np.float32)
    batch = np.zeros(n, np.int64)
    sel = fps(pos, batch, ratio=0.5, random_start=False)
    row, col = radius(pos, pos[sel], 1.5, batch, batch[sel],
                      max_num_neighbors=64)
    # senders index the full set, receivers the fps-selected dst set
    conv = PointConv(local_nn=fnn.Dense(10), global_nn=fnn.Dense(7))
    args = (jnp.asarray(x), (jnp.asarray(pos), jnp.asarray(pos[sel])),
            jnp.asarray(col), jnp.asarray(row), len(sel))
    params = conv.init(jax.random.PRNGKey(0), *args)
    ours = np.asarray(conv.apply(params, *args))

    p = params["params"]
    Wl, bl = _t(p["local_nn"]["kernel"]), _t(p["local_nn"]["bias"])
    Wg, bg = _t(p["global_nn"]["kernel"]), _t(p["global_nn"]["bias"])
    rel = _t(pos)[col] - _t(pos[sel])[row]
    msg = torch.cat([_t(x)[col], rel], dim=1) @ Wl + bl
    out = torch.full((len(sel), 10), -float("inf"))
    idx = torch.as_tensor(row, dtype=torch.long)
    out = out.scatter_reduce(0, idx[:, None].expand(-1, 10), msg,
                             reduce="amax", include_self=True)
    out = out @ Wg + bg
    np.testing.assert_allclose(ours, out.numpy(), rtol=2e-4, atol=2e-5)


def test_graclus_max_pool_vs_torch_oracle():
    """max_pool on a graclus clustering vs a torch oracle: same cluster
    vector fed to both; compares pooled x (scatter-max), pooled pos
    (scatter-mean), and the coalesced edge set (reference max_pool
    semantics, examples/mnist_graclus.py:41)."""
    from pytorch_geometric_tpu.nn.pool.coarsen import graclus, max_pool

    rng = np.random.default_rng(5)
    n = 30
    ei = np.unique(np.stack([rng.integers(0, n, 90),
                             rng.integers(0, n, 90)]), axis=1)
    keep = ei[0] != ei[1]
    ei = ei[:, keep]
    x = rng.normal(size=(n, 4)).astype(np.float32)
    pos = rng.normal(size=(n, 2)).astype(np.float32)
    data = Data(x=x, edge_index=ei, pos=pos)
    cluster = graclus(ei[0], ei[1], num_nodes=n)
    pooled = max_pool(cluster, data)

    # torch oracle on the same cluster vector
    uniq, inv = np.unique(cluster, return_inverse=True)
    k = len(uniq)
    invt = torch.as_tensor(inv, dtype=torch.long)
    ex = torch.full((k, 4), -float("inf")).scatter_reduce(
        0, invt[:, None].expand(-1, 4), _t(x), reduce="amax",
        include_self=True)
    cnt = _scatter_add(torch.ones(n), inv, k)
    ep = _scatter_add(_t(pos), inv, k) / cnt[:, None]
    np.testing.assert_allclose(pooled.x, ex.numpy(), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(pooled.pos, ep.numpy(), rtol=1e-6,
                               atol=1e-6)
    exp_edges = {(inv[s], inv[r]) for s, r in ei.T if inv[s] != inv[r]}
    got_edges = set(zip(pooled.edge_index[0].tolist(),
                        pooled.edge_index[1].tolist()))
    assert got_edges == exp_edges


def test_max_pool_x_vs_torch_oracle():
    """Device-path max_pool_x vs torch scatter-amax on the same
    cluster ids (reference max_pool_x, examples/mnist_graclus.py:46)."""
    from pytorch_geometric_tpu.nn.pool.coarsen import max_pool_x

    rng = np.random.default_rng(6)
    n, k, f = 24, 9, 5
    cluster = rng.integers(0, k, n)
    x = rng.normal(size=(n, f)).astype(np.float32)
    batch = (np.arange(n) >= 12).astype(np.int64)
    # graclus never merges across graphs; make the fixture consistent
    cluster = np.where(batch == 0, cluster % 5, 5 + cluster % 4)
    px, pb = max_pool_x(jnp.asarray(cluster), jnp.asarray(x),
                        jnp.asarray(batch), num_clusters=k)

    invt = torch.as_tensor(cluster, dtype=torch.long)
    ex = torch.full((k, f), -float("inf")).scatter_reduce(
        0, invt[:, None].expand(-1, f), _t(x), reduce="amax",
        include_self=True)
    for c in range(k):
        if (cluster == c).any():
            np.testing.assert_allclose(np.asarray(px)[c],
                                       ex[c].numpy(), rtol=1e-6)
            assert int(np.asarray(pb)[c]) == int(batch[cluster == c][0])
