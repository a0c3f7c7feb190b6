"""GraphSAGE with neighbor sampling on Reddit — the north-star sampled
mini-batch config ("GraphSAGE + NeighborSampler on PPI/Reddit",
BASELINE.json; reference analog examples/ppi.py:11-16 inductive
training).

Host pipeline: native C++ uniform neighbor sampler -> padded static
subgraphs; device: 2-layer SAGE, loss on seed nodes only.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data.neighbor_loader import NeighborSampler
from pytorch_geometric_tpu.datasets import Reddit
from pytorch_geometric_tpu.nn.conv import SAGEConv


class SAGE(nn.Module):
    hidden: int
    num_classes: int

    @nn.compact
    def __call__(self, graph, x):
        x = nn.relu(SAGEConv(self.hidden, name="conv1")(graph, x))
        return SAGEConv(self.num_classes, name="conv2")(graph, x)


def run(epochs: int = 1, batch_size: int = 512, seed: int = 0,
        max_batches: int = 20):
    ds = Reddit("datasets_cache")
    data = ds[0]
    train_nodes = np.flatnonzero(data.train_mask)
    val_nodes = np.flatnonzero(data.val_mask)

    loader = NeighborSampler(
        data.edge_index[0], data.edge_index[1], data.num_nodes,
        sizes=[10, 10], node_features=data.x, labels=data.y,
        batch_size=batch_size, seed_nodes=train_nodes, seed=seed)
    val_loader = NeighborSampler(
        data.edge_index[0], data.edge_index[1], data.num_nodes,
        sizes=[10, 10], node_features=data.x, labels=data.y,
        batch_size=batch_size, seed_nodes=val_nodes, shuffle=False)

    model = SAGE(hidden=128, num_classes=int(data.y.max()) + 1)
    g0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(seed), g0, g0.x)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, graph):
        def loss_fn(p):
            logits = model.apply(p, graph, graph.x)
            logp = jax.nn.log_softmax(logits)
            y = graph.y.astype(jnp.int32)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = graph.extras["seed_mask"].astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def eval_step(params, graph):
        logits = model.apply(params, graph, graph.x)
        pred = jnp.argmax(logits, axis=1)
        m = graph.extras["seed_mask"]
        return jnp.sum((pred == graph.y.astype(jnp.int32)) & m), \
            jnp.sum(m)

    for epoch in range(1, epochs + 1):
        losses = []
        for i, graph in enumerate(loader):
            if i >= max_batches:
                break
            params, opt, loss = train_step(params, opt, graph)
            losses.append(float(loss))
        cor = tot = 0
        for i, graph in enumerate(val_loader):
            if i >= max_batches // 2:
                break
            c, t = eval_step(params, graph)
            cor, tot = cor + int(c), tot + int(t)
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses):.4f}, "
              f"Val Acc: {cor / max(tot, 1):.4f}")
    return cor / max(tot, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1)
    args = p.parse_args()
    run(args.epochs)
