"""Data parallelism on the mocked 8-device CPU mesh (SURVEY §4: the
multi-host testing layer the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_geometric_tpu.data.batch import collate
from pytorch_geometric_tpu.datasets.synthetic import (
    synthetic_graph_classification,
)
from pytorch_geometric_tpu.models.graph_pred import (
    GraphClassifier,
    graph_xent_loss,
)
from pytorch_geometric_tpu.parallel import (
    DataParallelTrainer,
    make_mesh,
    shard_data_list,
)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual mesh")
def test_dp_step_matches_single_device():
    n_dev = len(jax.devices())
    datas = synthetic_graph_classification(
        n_dev * 2, 12, 6, 3, seed=0)
    NN, NE, GPS = 128, 256, 2
    stacked = shard_data_list(datas, n_dev, NN, NE, GPS)

    model = GraphClassifier(hidden_channels=8, num_classes=3)
    g0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
    params = model.init(jax.random.PRNGKey(0), g0)

    def loss_fn(p, graph, rng):
        logits = model.apply(p, graph)
        return graph_xent_loss(logits, graph.y, graph.graph_mask)

    tx = optax.sgd(0.1)
    mesh = make_mesh()
    trainer = DataParallelTrainer(mesh, loss_fn, tx)
    opt_state = trainer.init(params)
    p1, o1, loss = trainer.step(params, opt_state, stacked,
                                jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # single-device reference: mean of per-shard grads
    def full_loss(p):
        tot = 0.0
        for i in range(n_dev):
            gi = jax.tree_util.tree_map(lambda a: a[i], stacked)
            tot = tot + loss_fn(p, gi, None)
        return tot / n_dev

    grads = jax.grad(full_loss)(params)
    updates, _ = tx.init(params), None
    expected = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params,
                                      grads)
    flat_a = jax.tree_util.tree_leaves(p1)
    flat_b = jax.tree_util.tree_leaves(expected)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
