"""TopK pooling on ENZYMES — mirror of the reference's
examples/enzymes_topk_pool.py (GraphConv + TopKPooling x3, readout =
concat(gmp, gap) summed across levels)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import DataLoader
from pytorch_geometric_tpu.datasets import TUDataset
from pytorch_geometric_tpu.nn.conv import GraphConv
from pytorch_geometric_tpu.nn.pool import (
    TopKPooling,
    global_max_pool,
    global_mean_pool,
)


class Net(nn.Module):
    num_classes: int
    hidden: int = 128

    @nn.compact
    def __call__(self, graph, *, train: bool = False):
        x = graph.x
        summaries = []
        g = graph
        for i in range(3):
            x = nn.relu(GraphConv(self.hidden, name=f"conv{i+1}")(g, x))
            g = g.replace(x=x)
            g, x, _ = TopKPooling(self.hidden, ratio=0.8,
                                  name=f"pool{i+1}")(g, x)
            s = jnp.concatenate([global_max_pool(x, g),
                                 global_mean_pool(x, g)], axis=1)
            summaries.append(s)
        h = sum(summaries)
        h = nn.relu(nn.Dense(self.hidden)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.Dense(self.hidden // 2)(h))
        return nn.Dense(self.num_classes)(h)


def run(epochs: int = 20, batch_size: int = 64, seed: int = 0):
    ds = TUDataset("datasets_cache", "ENZYMES").shuffle(seed=seed)
    n = len(ds)
    test_ds, train_ds = ds[: n // 10], ds[n // 10:]
    train_loader = DataLoader(train_ds, batch_size=batch_size,
                              shuffle=True, seed=seed)
    test_loader = DataLoader(test_ds, batch_size=batch_size)

    model = Net(num_classes=6)
    g0 = next(iter(train_loader))
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, g0)
    tx = optax.adam(5e-4)
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
        print(f"Epoch {epoch:03d}, Loss: {np.mean(losses):.4f}, "
              f"Test Acc: {cor / max(tot, 1):.4f}")
    return cor / max(tot, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    args = p.parse_args()
    run(args.epochs)
