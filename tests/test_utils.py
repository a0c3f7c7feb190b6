"""utils module coverage: degree, loops, normalized_cut, conversions,
reordering."""

import jax.numpy as jnp
import networkx as nx
import numpy as np

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.utils import (
    add_self_loops,
    degree,
    from_networkx,
    is_undirected,
    normalized_cut,
    remove_self_loops,
    repeat,
    to_dense_batch,
    to_networkx,
    to_undirected,
)
from pytorch_geometric_tpu.utils.reorder import (
    rcm_permutation,
    reorder_graph,
    window_density,
)


def test_degree():
    idx = jnp.asarray([0, 1, 1, 3])
    np.testing.assert_allclose(np.asarray(degree(idx, 5)),
                               [1, 2, 0, 1, 0])


def test_self_loops():
    s = jnp.asarray([0, 1])
    r = jnp.asarray([1, 1])
    s2, r2, w2 = add_self_loops(s, r, 3, jnp.asarray([2.0, 3.0]),
                                fill_value=0.5)
    assert s2.shape[0] == 5
    np.testing.assert_allclose(np.asarray(w2), [2, 3, 0.5, 0.5, 0.5])
    ss, rr, _ = remove_self_loops(np.asarray([0, 1, 2]),
                                  np.asarray([0, 2, 2]))
    assert ss.tolist() == [1]


def test_normalized_cut():
    # path graph 0-1-2: degree [1,2,1]
    s = jnp.asarray([0, 1, 1, 2])
    r = jnp.asarray([1, 0, 2, 1])
    w = jnp.ones(4)
    out = np.asarray(normalized_cut(s, r, w, 3))
    np.testing.assert_allclose(out, [1 / 2 + 1, 1 + 1 / 2, 1 / 2 + 1,
                                     1 + 1 / 2])


def test_undirected():
    s = np.array([0, 1])
    r = np.array([1, 2])
    s2, r2 = to_undirected(s, r, 3)
    assert is_undirected(s2, r2, 3)
    assert len(s2) == 4


def test_to_dense_batch():
    x = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    batch = jnp.asarray([0, 0, 1, 1, 1])
    out, mask = to_dense_batch(x, batch, num_graphs=2, max_num_nodes=3)
    assert out.shape == (2, 3, 2)
    np.testing.assert_allclose(np.asarray(out)[0, 0], [0, 1])
    np.testing.assert_allclose(np.asarray(out)[1, 2], [8, 9])
    assert np.asarray(mask).sum() == 5


def test_repeat():
    assert repeat(3, 4) == [3, 3, 3, 3]
    assert repeat([1, 2], 4) == [1, 2, 1, 2]
    assert repeat([1, 2, 3], 2) == [1, 2]


def test_networkx_roundtrip():
    G = nx.path_graph(4)
    d = from_networkx(G)
    assert d.num_nodes == 4
    assert d.num_edges == 6  # both directions
    G2 = to_networkx(d, to_undirected=True)
    assert nx.is_isomorphic(G, G2)


def test_rcm_reorder_improves_window_density(rng):
    # ring lattice: neighbours are far apart after a random relabeling
    n = 512
    ring_s = np.arange(n)
    ring_r = (ring_s + 1) % n
    perm = rng.permutation(n)
    s, r = perm[ring_s], perm[ring_r]
    d = Data(x=np.zeros((n, 2), np.float32),
             edge_index=np.stack([s, r]))
    before = window_density(s, r, n, window=64)[0]
    d2 = reorder_graph(d)
    after = window_density(d2.edge_index[0], d2.edge_index[1], n,
                           window=64)[0]
    assert after < before  # fewer non-empty window buckets
    # structure preserved: still one cycle
    G = nx.Graph()
    G.add_edges_from(zip(d2.edge_index[0].tolist(),
                         d2.edge_index[1].tolist()))
    assert nx.is_connected(G)
    assert all(deg == 2 for _, deg in G.degree())


def test_to_dense_adj_batched(rng):
    import jax.numpy as jnp

    from pytorch_geometric_tpu.utils.convert import to_dense_adj

    # two graphs: 3 nodes + 2 nodes, block-diagonal indexing
    batch = jnp.asarray([0, 0, 0, 1, 1])
    senders = jnp.asarray([0, 1, 2, 3, 4])
    receivers = jnp.asarray([1, 2, 0, 4, 3])
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    adj = to_dense_adj(senders, receivers, batch=batch, edge_weight=w,
                       max_num_nodes=3)
    assert adj.shape == (2, 3, 3)
    assert float(adj[0, 0, 1]) == 1.0
    assert float(adj[0, 1, 2]) == 2.0
    assert float(adj[0, 2, 0]) == 3.0
    assert float(adj[1, 0, 1]) == 4.0   # node 3 -> local 0, 4 -> 1
    assert float(adj[1, 1, 0]) == 5.0
    assert float(jnp.sum(adj)) == 15.0
