"""Layered training closure: exact parity with full-graph execution."""

import jax
import numpy as np

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.data.closure import layered_training_closure
from pytorch_geometric_tpu.nn.conv import RGCNConv
from pytorch_geometric_tpu.nn.conv.rgcn_conv import (
    rgcn_closure_norm,
    rgcn_norm,
)
from pytorch_geometric_tpu.utils.k_hop_subgraph import k_hop_subgraph


def _random_relational_graph(rng, n=60, e=300, r=4):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    et = rng.integers(0, r, e)
    return ei, et


def test_k_hop_subgraph_reaches_exact_receptive_field(rng):
    ei, _ = _random_relational_graph(rng)
    subset, sub_ei, mapping, emask = k_hop_subgraph(
        [3, 7], 2, ei, relabel_nodes=True, num_nodes=60)
    # seeds come first
    assert list(subset[:2]) == [3, 7]
    assert list(mapping) == [0, 1]
    # every kept edge runs between subset nodes
    assert sub_ei.min() >= 0 and sub_ei.max() < subset.shape[0]
    # 1-hop senders of seeds must be present
    one_hop = set(ei[0][np.isin(ei[1], [3, 7])])
    assert one_hop.issubset(set(subset))
    assert emask.sum() == sub_ei.shape[1]


def test_closure_rgcn_matches_full_graph(rng):
    n, e, r = 60, 300, 4
    ei, et = _random_relational_graph(rng, n, e, r)
    seeds = np.array([2, 11, 30, 59])
    g = from_data(Data(edge_index=ei, edge_type=et, num_nodes=n))
    etg = g.extras["edge_type"]

    conv1 = RGCNConv(g.num_nodes, 8, r, num_bases=3, name="c1")
    conv2 = RGCNConv(8, 3, r, num_bases=3, name="c2")

    norm = rgcn_norm(g, etg, r)
    key = jax.random.PRNGKey(0)
    p1 = conv1.init(key, g, None, etg, norm)
    p2 = conv2.init(key, g,
                    conv1.apply(p1, g, None, etg, norm), etg, norm)

    h_full = jax.nn.relu(conv1.apply(p1, g, None, etg, norm))
    out_full = conv2.apply(p2, g, h_full, etg, norm)

    layers = layered_training_closure(ei, seeds, 2, num_nodes=n,
                                      edge_type=et, pad_multiple=32)
    norms = [rgcn_closure_norm(cl, r) for cl in layers]
    h1 = jax.nn.relu(conv1.apply(p1, None, None, None,
                                 norm=norms[0], closure=layers[0]))
    out_cl = conv2.apply(p2, None, h1, None,
                         norm=norms[1], closure=layers[1])

    # final layer's out_global lists the seeds first, in order
    got = np.asarray(out_cl)[: seeds.shape[0]]
    want = np.asarray(out_full)[seeds]
    assert list(np.asarray(layers[1].out_global[: seeds.shape[0]])) \
        == list(seeds)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_closure_gradients_match_full_graph(rng):
    """The pruned computation must give the same parameter gradients."""
    import jax.numpy as jnp

    n, e, r = 50, 220, 3
    ei, et = _random_relational_graph(rng, n, e, r)
    seeds = np.array([1, 5, 9])
    y = np.array([0, 2, 1])
    g = from_data(Data(edge_index=ei, edge_type=et, num_nodes=n))
    etg = g.extras["edge_type"]
    norm = rgcn_norm(g, etg, r)

    conv1 = RGCNConv(g.num_nodes, 6, r, num_bases=2, name="c1")
    conv2 = RGCNConv(6, 3, r, num_bases=2, name="c2")
    key = jax.random.PRNGKey(1)
    p1 = conv1.init(key, g, None, etg, norm)
    p2 = conv2.init(key, g,
                    conv1.apply(p1, g, None, etg, norm), etg, norm)

    def loss_full(ps):
        h = jax.nn.relu(conv1.apply(ps[0], g, None, etg, norm))
        logits = conv2.apply(ps[1], g, h, etg, norm)
        lp = jax.nn.log_softmax(logits[jnp.asarray(seeds)])
        return -jnp.mean(jnp.take_along_axis(
            lp, jnp.asarray(y)[:, None], axis=1))

    layers = layered_training_closure(ei, seeds, 2, num_nodes=n,
                                      edge_type=et, pad_multiple=32)
    norms = [rgcn_closure_norm(cl, r) for cl in layers]

    def loss_closure(ps):
        h = jax.nn.relu(conv1.apply(ps[0], None, None, None,
                                    norm=norms[0], closure=layers[0]))
        logits = conv2.apply(ps[1], None, h, None,
                             norm=norms[1], closure=layers[1])
        lp = jax.nn.log_softmax(logits[: seeds.shape[0]])
        return -jnp.mean(jnp.take_along_axis(
            lp, jnp.asarray(y)[:, None], axis=1))

    gf = jax.grad(loss_full)((p1, p2))
    gc = jax.grad(loss_closure)((p1, p2))
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_c = jax.tree_util.tree_leaves(gc)
    for a, b in zip(flat_f, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_closure_gcn_matches_full_graph(rng):
    import jax.numpy as jnp

    from pytorch_geometric_tpu.models.citation import GCN
    from pytorch_geometric_tpu.nn.conv.gcn_conv import (
        gcn_closure_norm, gcn_norm)

    n, e = 80, 400
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    x = rng.normal(size=(n, 12)).astype(np.float32)
    y = rng.integers(0, 3, n)
    tm = np.zeros(n, bool); tm[[4, 17, 33, 60]] = True
    g = from_data(Data(x=x, edge_index=ei, y=y, train_mask=tm,
                       val_mask=tm, test_mask=tm))

    emask = np.asarray(g.real_edge_mask())
    ei_real = np.stack([np.asarray(g.senders)[emask],
                        np.asarray(g.receivers)[emask]])
    seeds = np.flatnonzero(np.asarray(g.train_mask))
    layers = layered_training_closure(ei_real, seeds, 2,
                                      num_nodes=g.num_nodes,
                                      pad_multiple=32)
    cnorms = gcn_closure_norm(ei_real, g.num_nodes, layers)
    x0 = jnp.take(g.x, layers[0].in_global, axis=0)

    model = GCN(hidden_channels=8, num_classes=3)
    params = model.init({"params": jax.random.PRNGKey(0)}, None, x0,
                        closure=layers, closure_norms=cnorms)
    full = model.apply(params, g, g.x, gcn_norm(g))
    cl = model.apply(params, None, x0, closure=layers,
                     closure_norms=cnorms)
    np.testing.assert_allclose(np.asarray(cl)[: seeds.shape[0]],
                               np.asarray(full)[seeds],
                               rtol=1e-4, atol=1e-5)


def test_closure_gat_matches_full_graph(rng):
    import jax.numpy as jnp

    from pytorch_geometric_tpu.nn.conv import GATConv

    n, e = 70, 350
    ei = np.unique(np.stack([rng.integers(0, n, e),
                             rng.integers(0, n, e)]), axis=1)
    x = rng.normal(size=(n, 10)).astype(np.float32)
    g = from_data(Data(x=x, edge_index=ei))
    seeds = np.array([3, 12, 40])

    conv = GATConv(out_channels=6, heads=3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    full = np.asarray(conv.apply(params, g, g.x))

    emask = np.asarray(g.real_edge_mask())
    ei_real = np.stack([np.asarray(g.senders)[emask],
                        np.asarray(g.receivers)[emask]])
    layers = layered_training_closure(ei_real, seeds, 1,
                                      num_nodes=g.num_nodes,
                                      pad_multiple=32)
    x0 = jnp.take(g.x, layers[0].in_global, axis=0)
    cl_out = np.asarray(conv.apply(params, None, x0,
                                   closure=layers[0]))
    np.testing.assert_allclose(cl_out[: seeds.shape[0]], full[seeds],
                               rtol=1e-4, atol=1e-5)
