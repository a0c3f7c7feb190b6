"""SplineConv shape correspondence on FAUST — mirror of the reference's
examples/faust.py (FaceToEdge + Cartesian pseudo-coords, 6 SplineConv
layers, per-vertex classification over vertex ids, degree-based target
weighting at examples/faust.py:19)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import DataLoader
from pytorch_geometric_tpu.datasets import FAUST
from pytorch_geometric_tpu.nn.conv import SplineConv
from pytorch_geometric_tpu.transforms import Cartesian, Compose, FaceToEdge


class Net(nn.Module):
    num_vertices: int

    @nn.compact
    def __call__(self, graph, *, train: bool = False):
        x = jnp.ones((graph.num_nodes, 1), jnp.float32)
        for i, ch in enumerate([32, 64, 64, 64, 64, 64]):
            x = nn.elu(SplineConv(ch, dim=3, kernel_size=5,
                                  name=f"conv{i+1}")(graph, x))
        x = nn.elu(nn.Dense(256)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_vertices)(x)


def run(epochs: int = 3, seed: int = 0, num_vertices: int = 684):
    pre = Compose([FaceToEdge(), Cartesian()])
    train_ds = FAUST("datasets_cache", train=True, pre_transform=pre,
                     num_vertices=num_vertices)
    test_ds = FAUST("datasets_cache", train=False, pre_transform=pre,
                    num_vertices=num_vertices)
    nv = train_ds[0].num_nodes
    train_loader = DataLoader(train_ds, batch_size=1, shuffle=True,
                              seed=seed)
    test_loader = DataLoader(test_ds, batch_size=1)

    model = Net(num_vertices=nv)
    g0 = next(iter(train_loader))
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, g0)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, graph, key):
        def loss_fn(p):
            logits = model.apply(p, graph, train=True,
                                 rngs={"dropout": key})
            logp = jax.nn.log_softmax(logits)
            y = graph.y.astype(jnp.int32)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = graph.node_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def eval_step(params, graph):
        logits = model.apply(params, graph)
        pred = jnp.argmax(logits, axis=1)
        m = graph.node_mask
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
