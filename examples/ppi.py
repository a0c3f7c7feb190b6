"""GAT on PPI (inductive multi-label) — mirror of the reference's
examples/ppi.py (3 GAT layers 4x256 + skip, BCEWithLogits, micro-F1)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import DataLoader
from pytorch_geometric_tpu.datasets import PPI
from pytorch_geometric_tpu.nn.conv import GATConv


class Net(nn.Module):
    @nn.compact
    def __call__(self, graph, x, *, train: bool = False):
        h = GATConv(256, heads=4, name="conv1")(graph, x, train=train)
        x = nn.elu(h)
        h = GATConv(256, heads=4, name="conv2")(graph, x, train=train)
        x = nn.elu(h + nn.Dense(4 * 256, name="lin2")(x))
        x = GATConv(121, heads=6, concat=False, name="conv3")(
            graph, x, train=train) + nn.Dense(121, name="lin3")(x)
        return x


def micro_f1(pred, y, mask):
    pred = pred[mask]
    y = y[mask]
    tp = float(np.sum(pred * y))
    fp = float(np.sum(pred * (1 - y)))
    fn = float(np.sum((1 - pred) * y))
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def run(epochs: int = 10, seed: int = 0):
    train_ds = PPI("datasets_cache", "train")
    val_ds = PPI("datasets_cache", "val")
    train_loader = DataLoader(train_ds, batch_size=1, shuffle=True,
                              seed=seed)
    val_loader = DataLoader(val_ds, batch_size=2)

    model = Net()
    g0 = next(iter(train_loader))
    params = model.init(jax.random.PRNGKey(seed), g0, g0.x)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, graph):
        def loss_fn(p):
            logits = model.apply(p, graph, graph.x)
            bce = optax.sigmoid_binary_cross_entropy(logits, graph.y)
            m = graph.node_mask.astype(jnp.float32)[:, None]
            return jnp.sum(bce * m) / jnp.maximum(
                jnp.sum(m) * graph.y.shape[1], 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def predict(params, graph):
        return model.apply(params, graph, graph.x) > 0

    for epoch in range(1, epochs + 1):
        losses = [0.0]
        for graph in train_loader:
            params, opt, loss = train_step(params, opt, graph)
            losses.append(float(loss))
        preds, ys, masks = [], [], []
        for graph in val_loader:
            preds.append(np.asarray(predict(params, graph)))
            ys.append(np.asarray(graph.y))
            masks.append(np.asarray(graph.node_mask))
        f1 = micro_f1(np.concatenate(preds), np.concatenate(ys),
                      np.concatenate(masks))
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses[1:]):.4f}, "
              f"Val F1: {f1:.4f}")
    return f1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()
    run(args.epochs)
