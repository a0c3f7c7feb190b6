"""NNConv (edge-conditioned) on MNIST superpixels — mirror of the
reference's examples/mnist_nn_conv.py (two NNConv layers with
Cartesian pseudo-coordinates, aggr='mean', voxel-precomputed pooling,
FC head)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import DataLoader
from pytorch_geometric_tpu.datasets import MNISTSuperpixels
from pytorch_geometric_tpu.nn.conv import NNConv
from pytorch_geometric_tpu.nn.pool import global_mean_pool, \
    pool_graph_masked
from pytorch_geometric_tpu.transforms import Cartesian, Compose


class EdgeNN(nn.Module):
    out: int

    @nn.compact
    def __call__(self, ea):
        return nn.Dense(self.out)(nn.relu(nn.Dense(25)(ea)))


class Net(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, graph, *, train: bool = False):
        x = nn.elu(NNConv(32, EdgeNN(1 * 32), aggr="mean",
                          name="conv1")(graph, graph.x))
        g = pool_graph_masked(graph.extras["cluster1"],
                              graph.replace(x=x), reduce="max")
        from examples.mnist_graclus import device_cartesian
        g = device_cartesian(g)
        x = nn.elu(NNConv(64, EdgeNN(32 * 64), aggr="mean",
                          name="conv2")(g, g.x))
        g = pool_graph_masked(graph.extras["cluster2"],
                              g.replace(x=x), reduce="max")
        h = global_mean_pool(g.x, g)
        h = nn.elu(nn.Dense(128)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes)(h)


def run(epochs: int = 3, batch_size: int = 64, seed: int = 0,
        train_samples: int = 1000):
    from examples.mnist_voxel_grid import PrecomputeVoxelLevels

    transform = Compose([Cartesian(), PrecomputeVoxelLevels()])
    train_ds = MNISTSuperpixels("datasets_cache_voxel", train=True,
                                pre_transform=transform,
                                num_synthetic=train_samples)
    test_ds = MNISTSuperpixels("datasets_cache_voxel", train=False,
                               pre_transform=transform,
                               num_synthetic=train_samples)
    train_loader = DataLoader(train_ds, batch_size=batch_size,
                              shuffle=True, seed=seed)
    test_loader = DataLoader(test_ds, batch_size=batch_size)

    model = Net()
    g0 = next(iter(train_loader))
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, g0)
    tx = optax.adam(0.01)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, graph, key):
        def loss_fn(p):
            logits = model.apply(p, graph, train=True,
                                 rngs={"dropout": key})
            logp = jax.nn.log_softmax(logits)
            y = graph.y.astype(jnp.int32)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = graph.graph_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def eval_step(params, graph):
        logits = model.apply(params, graph)
        pred = jnp.argmax(logits, axis=1)
        m = graph.graph_mask
        return jnp.sum((pred == graph.y.astype(jnp.int32)) & m), \
            jnp.sum(m)

    for epoch in range(1, epochs + 1):
        losses = []
        for graph in train_loader:
            key, sub = jax.random.split(key)
            params, opt, loss = train_step(params, opt, graph, sub)
            losses.append(float(loss))
        cor = tot = 0
        for graph in test_loader:
            c, t = eval_step(params, graph)
            cor, tot = cor + int(c), tot + int(t)
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses):.4f}, "
              f"Test Acc: {cor / max(tot, 1):.4f}")
    return cor / max(tot, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()
    run(args.epochs)
