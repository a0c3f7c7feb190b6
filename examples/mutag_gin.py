"""GIN on MUTAG graph classification — mirror of the reference's
examples/mutag_gin.py (GIN convs with MLPs + global_add_pool readout,
Adam, train/test split).

TPU-first: the whole epoch (all batches pre-collated to one static
shape) trains under jit; dataset falls back to a synthetic MUTAG-shaped
corpus offline.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import DataLoader
from pytorch_geometric_tpu.datasets import TUDataset
from pytorch_geometric_tpu.nn.conv import GINConv
from pytorch_geometric_tpu.nn.norm import MaskedBatchNorm
from pytorch_geometric_tpu.nn.pool import global_add_pool


class MLP(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.Dense(self.hidden)(x)
        x = MaskedBatchNorm()(x, mask, train=train)
        return x


class Net(nn.Module):
    hidden: int
    num_classes: int

    @nn.compact
    def __call__(self, graph, *, train: bool = False):
        x = graph.x
        for i in range(5):
            x = GINConv(mlp=MLP(self.hidden), train_eps=True,
                        name=f"conv{i + 1}")(graph, x, train=train)
            x = nn.relu(x)
        hg = global_add_pool(x, graph)
        hg = nn.relu(nn.Dense(self.hidden)(hg))
        return nn.Dense(self.num_classes)(hg)


def run(epochs: int = 30, batch_size: int = 32, seed: int = 0):
    dataset = TUDataset("datasets_cache", "MUTAG").shuffle(seed=seed)
    n = len(dataset)
    test_ds = dataset[: n // 10]
    train_ds = dataset[n // 10:]
    train_loader = DataLoader(train_ds, batch_size=batch_size,
                              shuffle=True, seed=seed)
    test_loader = DataLoader(test_ds, batch_size=batch_size)

    model = Net(hidden=32, num_classes=2)
    g0 = next(iter(train_loader))
    variables = model.init(jax.random.PRNGKey(seed), g0)
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})
    tx = optax.adam(0.01)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt, graph):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, graph,
                train=True, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(logits)
            y = graph.y.astype(jnp.int32)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = graph.graph_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), \
            mut["batch_stats"], opt, loss

    @jax.jit
    def eval_step(params, batch_stats, graph):
        logits = model.apply({"params": params,
                              "batch_stats": batch_stats}, graph)
        pred = jnp.argmax(logits, axis=1)
        m = graph.graph_mask
        correct = jnp.sum((pred == graph.y.astype(jnp.int32)) & m)
        return correct, jnp.sum(m)

    for epoch in range(1, epochs + 1):
        losses = []
        for graph in train_loader:
            params, batch_stats, opt, loss = train_step(
                params, batch_stats, opt, graph)
            losses.append(float(loss))
        cor = tot = 0
        for graph in test_loader:
            c, t = eval_step(params, batch_stats, graph)
            cor, tot = cor + int(c), tot + int(t)
        print(f"Epoch {epoch:03d}, Loss: {np.mean(losses):.4f}, "
              f"Test Acc: {cor / max(tot, 1):.4f}")
    return cor / max(tot, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()
    run(args.epochs, args.batch_size)
