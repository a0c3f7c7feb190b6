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

    # index-shipping batches: features/labels stay device-resident and
    # are gathered in-jit via local_to_global — a batch transfers only
    # ~0.2 MB of int32 ids instead of a ~137 MB padded feature matrix
    # (measured 50x on the sampled-epoch wall-clock)
    loader = NeighborSampler(
        data.edge_index[0], data.edge_index[1], data.num_nodes,
        sizes=[10, 10], batch_size=batch_size,
        seed_nodes=train_nodes, seed=seed,
        materialize_features=False)
    val_loader = NeighborSampler(
        data.edge_index[0], data.edge_index[1], data.num_nodes,
        sizes=[10, 10], batch_size=batch_size, seed_nodes=val_nodes,
        shuffle=False, materialize_features=False)
    # device_tables appends a zero row at index num_nodes — the
    # sentinel the loader's padding ids point at
    x_dev, y_dev = loader.device_tables(
        np.asarray(data.x, np.float32), np.asarray(data.y, np.int32))

    model = SAGE(hidden=128, num_classes=int(data.y.max()) + 1)
    g0 = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(seed), g0,
        jnp.take(x_dev, g0.extras["local_to_global"], axis=0))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, graph, x_dev, y_dev):
        ids = graph.extras["local_to_global"]
        x = jnp.take(x_dev, ids, axis=0)
        y = jnp.take(y_dev, ids)

        def loss_fn(p):
            logits = model.apply(p, graph, x)
            logp = jax.nn.log_softmax(logits)
            oh = (y[:, None] == jnp.arange(logp.shape[1])[None, :])
            nll = -jnp.sum(logp * oh.astype(logp.dtype), axis=1)
            m = graph.extras["seed_mask"].astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def eval_step(params, graph, x_dev, y_dev):
        ids = graph.extras["local_to_global"]
        logits = model.apply(params, graph,
                             jnp.take(x_dev, ids, axis=0))
        pred = jnp.argmax(logits, axis=1)
        m = graph.extras["seed_mask"]
        return jnp.sum((pred == jnp.take(y_dev, ids)) & m), jnp.sum(m)

    for epoch in range(1, epochs + 1):
        losses = []
        for i, graph in enumerate(loader):
            if i >= max_batches:
                break
            params, opt, loss = train_step(params, opt, graph, x_dev,
                                           y_dev)
            losses.append(float(loss))
        cor = tot = 0
        for i, graph in enumerate(val_loader):
            if i >= max_batches // 2:
                break
            c, t = eval_step(params, graph, x_dev, y_dev)
            cor, tot = cor + int(c), tot + int(t)
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses):.4f}, "
              f"Val Acc: {cor / max(tot, 1):.4f}")
    return cor / max(tot, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1)
    args = p.parse_args()
    run(args.epochs)
