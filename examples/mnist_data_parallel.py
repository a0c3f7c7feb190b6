"""Multi-device MNISTSuperpixels training — mirror of the reference's
examples/test.py (its second DataParallel MNIST script,
examples/test.py:1-48): DataListLoader batches scattered across
devices, per-device forward, psum'd gradients.

Run with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh.
"""

import argparse

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from pytorch_geometric_tpu.data import DataListLoader
from pytorch_geometric_tpu.data.batch import bucket_size, collate
from pytorch_geometric_tpu.datasets import MNISTSuperpixels
from pytorch_geometric_tpu.models.graph_pred import (
    GraphClassifier,
    graph_xent_loss,
)
from pytorch_geometric_tpu.parallel import (
    DataParallelTrainer,
    shard_data_list,
)


def run(epochs: int = 1, batch_size: int = 32, num_samples: int = 512,
        seed: int = 0):
    ds = MNISTSuperpixels("datasets_cache", train=True,
                          num_synthetic=num_samples)
    n_dev = len(jax.devices())
    batch_size = max(batch_size // n_dev, 1) * n_dev
    gps = batch_size // n_dev
    shard_nodes = bucket_size(gps * 76 + 1)
    shard_edges = bucket_size(gps * 75 * 8 * 2)
    loader = DataListLoader(ds, batch_size=batch_size, shuffle=True,
                            seed=seed)
    model = GraphClassifier(hidden_channels=32, num_classes=10)
    g0 = collate([ds[0]], num_nodes=shard_nodes, num_edges=shard_edges,
                 num_graphs=gps + 1)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, g0)
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))

    def loss_fn(p, graph, rng):
        return graph_xent_loss(model.apply(p, graph), graph.y,
                               graph.graph_mask)

    trainer = DataParallelTrainer(mesh, loss_fn, optax.adam(1e-3))
    opt_state = trainer.init(params)
    losses = []
    for epoch in range(epochs):
        for data_list in loader:
            if len(data_list) < n_dev:
                continue
            key, sub = jax.random.split(key)
            stacked = shard_data_list(data_list, n_dev, shard_nodes,
                                      shard_edges, gps)
            params, opt_state, loss = trainer.step(params, opt_state,
                                                   stacked, sub)
            losses.append(float(loss))
        print(f"Epoch {epoch + 1}: mean loss "
              f"{float(np.mean(losses)):.4f} over {n_dev} devices")
    return float(np.mean(losses))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()
    run(args.epochs, args.batch_size)
