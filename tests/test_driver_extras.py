"""Round-3 driver-completeness tests (VERDICT item 7).

Covers the reference pipeline branches the round-2 driver lacked:
SplineNet in the model zoo (ConvexPruning.py:278-299), the PPI dispatch
(ConvexPruning.py:492-501), the MNISTSuperpixels dispatch
(ConvexPruning.py:515), and the fused-backend routing of PrunableGAT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.models.prunable import MODEL_ZOO, choose_model


def _tiny_graph(n=32, e=96, f=16, classes=4, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    keep = s != r
    s, r = s[keep], r[keep]
    y = rng.integers(0, classes, n)
    split = rng.random(n)
    return Graph(
        senders=jnp.asarray(s, jnp.int32),
        receivers=jnp.asarray(r, jnp.int32),
        x=jnp.asarray(rng.normal(size=(n, f)).astype(np.float32)),
        y=jnp.asarray(y),
        node_mask=jnp.ones(n, bool),
        edge_mask=jnp.ones(s.shape[0], bool),
        extras={"train_mask": jnp.asarray(split < 0.6),
                "val_mask": jnp.asarray((split >= 0.6) & (split < 0.8)),
                "test_mask": jnp.asarray(split >= 0.8)})


def test_spline_in_zoo():
    assert "Spline" in MODEL_ZOO


def test_spline_model_trains():
    g = _tiny_graph()
    model = choose_model("Spline", [8, 8], 4)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, g, g.x)
    from pytorch_geometric_tpu.research.driver import train_part
    res = train_part(model, g, params, 5, lr=0.05)
    assert len(res.train_convergence) == 5
    assert res.train_convergence[-1] < res.train_convergence[0]


def test_spline_model_uses_edge_attr():
    g = _tiny_graph()
    pseudo = jnp.asarray(
        np.random.default_rng(1).random((g.senders.shape[0], 1)),
        jnp.float32)
    g = g.replace(edge_attr=pseudo)
    model = choose_model("Spline", [8], 4)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, g, g.x)
    out = model.apply(params, g, g.x)
    assert out.shape == (g.num_nodes, 4)
    out2 = model.apply(params, g.replace(edge_attr=pseudo * 0.0), g.x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_prunable_gat_fused_backend_matches_segment_path():
    """flash_op routing must be numerically equal to the generic
    segment-softmax path (eval mode, no dropout)."""
    from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat

    g = _tiny_graph(n=24, e=60)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    loops = np.arange(g.num_nodes)
    op = PackedFlashGat(
        senders=np.concatenate([s, loops]),
        receivers=np.concatenate([r, loops]),
        num_nodes=g.num_nodes, window=8, tile=128)
    model = choose_model("GAT", [16], 4, heads=4)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, g, g.x,
                        flash_op=op)
    out_fused = model.apply(params, g, g.x, flash_op=op)
    out_ref = model.apply(params, g, g.x)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_ref), atol=2e-2, rtol=2e-2)


def test_ppi_pipeline_smoke(tmp_path):
    from pytorch_geometric_tpu.research.driver import training_net_ppi
    res = training_net_ppi(model_name="GCN", num_layers=2, epochs=1,
                           fine_tune_epochs=1, batch_size=4,
                           monte_size=1,
                           results_dir=str(tmp_path / "Results"),
                           ckpt_dir=str(tmp_path / "ckpt"))
    assert len(res) == 1
    assert 0.0 <= res[0]["finetune_best"] <= 1.0


def test_mnist_dataset_batch_trains():
    """MNIST superpixel graphs flow through the graph-cls loss."""
    import optax

    from pytorch_geometric_tpu.data import DataLoader
    from pytorch_geometric_tpu.datasets import MNISTSuperpixels
    from pytorch_geometric_tpu.transforms import Cartesian

    ds = MNISTSuperpixels("datasets_cache", train=True,
                          transform=Cartesian(), num_synthetic=64)
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    model = choose_model("TopK", [32, 32], ds.num_classes)
    g0 = next(iter(loader))
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, g0)

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, graph, rng):
        def loss_fn(p):
            logits = model.apply(p, graph, train=True,
                                 rngs={"dropout": rng})
            logp = jax.nn.log_softmax(logits)
            y = graph.y.astype(jnp.int32)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = graph.graph_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for graph in loader:
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, graph, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()


def test_mnist_in_graphcls_dispatch():
    from pytorch_geometric_tpu.research.driver import GRAPH_CLS_DATASETS
    assert "mnist" in GRAPH_CLS_DATASETS
