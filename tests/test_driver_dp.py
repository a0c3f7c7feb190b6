"""Multi-device research driver (VERDICT item 4): the graph-
classification prune-retrain pipeline runs data-parallel on the
virtual 8-device mesh, mirroring the reference's DataParallel usage
(ConvexPruning.py:530-531,559-560)."""

import jax
import numpy as np
import pytest

from pytorch_geometric_tpu.research.driver import training_net_graphcls


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_graphcls_pipeline_dp8(tmp_path):
    res = training_net_graphcls(
        "mutag", model_name="TopK", num_layers=2, epochs=2,
        fine_tune_epochs=2, batch_size=16, monte_size=1,
        results_dir=str(tmp_path / "Results"),
        ckpt_dir=str(tmp_path / "ckpt"), num_devices=8)
    assert len(res) == 1
    r = res[0]
    assert np.isfinite(r["pretrain_best"])
    assert np.isfinite(r["finetune_best"])
    assert 0.0 <= r["finetune_best"] <= 1.0
    # convergence .npy files written like the reference's registry
    out = list((tmp_path / "Results" / "MUTAGConvergence").iterdir())
    assert any("TrainConvergence" in p.name for p in out)
    assert any("TestConvergence" in p.name for p in out)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_dp_matches_single_device_loss_scale():
    """DP pmean-of-means over equal shards == the single-device mean on
    the same batch (sanity of the loss semantics, one step)."""
    import optax
    from jax.sharding import Mesh

    from pytorch_geometric_tpu.data.batch import collate
    from pytorch_geometric_tpu.datasets import TUDataset
    from pytorch_geometric_tpu.models.prunable import choose_model
    from pytorch_geometric_tpu.parallel.data_parallel import (
        DataParallelTrainer,
        shard_data_list,
    )

    ds = TUDataset("datasets_cache", "MUTAG")
    data_list = [ds[i] for i in range(8)]
    model = choose_model("TopK", [16, 16], ds.num_classes)
    g0 = collate(data_list[:1], num_nodes=64, num_edges=256, num_graphs=2)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, g0)

    import jax.numpy as jnp

    def loss_fn(p, graph, rng):
        logits = model.apply(p, graph, train=True, rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits)
        y = graph.y.astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        m = graph.graph_mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    trainer = DataParallelTrainer(mesh, loss_fn, optax.sgd(0.0))
    opt_state = trainer.init(params)
    stacked = shard_data_list(data_list, 8, 64, 256, 1)
    _, _, dp_loss = trainer.step(params, opt_state, stacked, key)

    # single-device: mean of the 8 per-shard means (each shard = 1 graph)
    per = []
    for d in data_list:
        g = collate([d], num_nodes=64, num_edges=256, num_graphs=2)
        per.append(float(loss_fn(params, g, key)))
    np.testing.assert_allclose(float(dp_loss), np.mean(per), rtol=1e-4)
