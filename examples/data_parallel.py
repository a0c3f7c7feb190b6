"""Multi-device data parallelism — mirror of the reference's
examples/data_parallel.py (DataListLoader + nn.DataParallel over GPUs).

TPU-native: graph-list shards are collated per device and the train step
runs under shard_map over a Mesh with psum'd gradients.  Run with
JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=8
for a virtual mesh, or on a real multi-chip slice unchanged.
"""

import argparse

import jax
import numpy as np
import optax

from pytorch_geometric_tpu.data import DataListLoader
from pytorch_geometric_tpu.datasets import TUDataset
from pytorch_geometric_tpu.models.graph_pred import (
    GraphClassifier,
    graph_xent_loss,
)
from pytorch_geometric_tpu.parallel import (
    DataParallelTrainer,
    make_mesh,
    shard_data_list,
)


def run(epochs: int = 5, seed: int = 0):
    n_dev = len(jax.devices())
    print(f"Let's use {n_dev} devices!")  # reference prints GPU count
    ds = TUDataset("datasets_cache", "MUTAG")
    loader = DataListLoader(ds, batch_size=n_dev * 4, shuffle=True,
                            seed=seed)

    # static per-shard budgets from the dataset
    max_n = max(d.num_nodes for d in ds) * 4 + 1
    max_e = max(d.num_edges for d in ds) * 4

    model = GraphClassifier(hidden_channels=32, num_classes=2)

    def loss_fn(params, graph, rng):
        logits = model.apply(params, graph)
        return graph_xent_loss(logits, graph.y, graph.graph_mask)

    mesh = make_mesh()
    trainer = DataParallelTrainer(mesh, loss_fn, optax.adam(1e-2))

    params = None
    opt_state = None
    key = jax.random.PRNGKey(seed)
    for epoch in range(1, epochs + 1):
        losses = []
        for data_list in loader:
            stacked = shard_data_list(data_list, n_dev, max_n, max_e, 4)
            if params is None:
                g0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
                params = model.init(key, g0)
                opt_state = trainer.init(params)
            params, opt_state, loss = trainer.step(params, opt_state,
                                                   stacked, key)
            losses.append(float(loss))
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses):.4f}")
    return params


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    args = p.parse_args()
    run(args.epochs)
