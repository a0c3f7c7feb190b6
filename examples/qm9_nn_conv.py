"""MPNN (NNConv + GRU + Set2Set) on QM9 target 0 — mirror of the
reference's examples/qm9_nn_conv.py (Complete + Distance transforms,
edge-conditioned conv, 3 GRU steps, Set2Set readout, MSE/MAE)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import DataLoader
from pytorch_geometric_tpu.datasets import QM9
from pytorch_geometric_tpu.nn.conv import NNConv
from pytorch_geometric_tpu.nn.pool import Set2Set
from pytorch_geometric_tpu.transforms import Distance
from pytorch_geometric_tpu.utils.loop import remove_self_loops


class Complete:
    """Dense edge set transform (reference qm9_nn_conv.py:24-47)."""

    def __call__(self, data):
        n = data.num_nodes
        row = np.repeat(np.arange(n), n)
        col = np.tile(np.arange(n), n)
        ea = None
        if data.edge_attr is not None:
            e = data.edge_attr
            ea = np.zeros((n * n,) + e.shape[1:], dtype=e.dtype)
            idx = data.edge_index[0] * n + data.edge_index[1]
            ea[idx] = e
        s, r, ea = remove_self_loops(row, col, ea)
        data.edge_index = np.stack([s, r])
        data.edge_attr = ea
        return data


class EdgeNN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, ea):
        h = nn.relu(nn.Dense(128)(ea))
        return nn.Dense(self.dim * self.dim)(h)


class Net(nn.Module):
    dim: int = 64

    @nn.compact
    def __call__(self, graph):
        x = nn.relu(nn.Dense(self.dim)(graph.x))
        conv = NNConv(self.dim, EdgeNN(self.dim), aggr="mean",
                      root_weight=True)
        gru = nn.GRUCell(features=self.dim)
        h = x
        for _ in range(3):
            m = nn.relu(conv(graph, h))
            h, _ = gru(h, m)
        out = Set2Set(self.dim, processing_steps=3)(h, graph)
        out = nn.relu(nn.Dense(self.dim)(out))
        return nn.Dense(1)(out)[:, 0]


def run(epochs: int = 5, batch_size: int = 32, seed: int = 0,
        num_samples: int = 1000):
    from pytorch_geometric_tpu.transforms import Compose
    ds = QM9("datasets_cache", transform=Compose([Complete(),
                                                  Distance(norm=False)]),
             num_synthetic=num_samples)
    # normalise target 0 (reference qm9_nn_conv.py:55-57 mutates .data.y)
    ys = np.stack([ds.data_list[i].y[0] for i in range(len(ds))])
    mean, std = ys[:, 0].mean(), ys[:, 0].std()
    n = len(ds)
    sh = ds.shuffle(seed=seed)
    test_ds, val_ds, train_ds = sh[: n // 10], sh[n // 10: n // 5], \
        sh[n // 5:]
    train_loader = DataLoader(train_ds, batch_size=batch_size,
                              shuffle=True, seed=seed)
    test_loader = DataLoader(test_ds, batch_size=batch_size)

    model = Net()
    g0 = next(iter(train_loader))
    params = model.init(jax.random.PRNGKey(seed), g0)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, graph):
        def loss_fn(p):
            pred = model.apply(p, graph)
            target = (graph.y[:, 0] - mean) / (std + 1e-12)
            m = graph.graph_mask.astype(jnp.float32)
            return jnp.sum(((pred - target) ** 2) * m) / \
                jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def eval_mae(params, graph):
        pred = model.apply(params, graph) * (std + 1e-12) + mean
        m = graph.graph_mask.astype(jnp.float32)
        return jnp.sum(jnp.abs(pred - graph.y[:, 0]) * m), m.sum()

    for epoch in range(1, epochs + 1):
        losses = []
        for graph in train_loader:
            params, opt, loss = train_step(params, opt, graph)
            losses.append(float(loss))
        tot = cnt = 0.0
        for graph in test_loader:
            s, c = eval_mae(params, graph)
            tot, cnt = tot + float(s), cnt + float(c)
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses):.4f}, "
              f"Test MAE: {tot / max(cnt, 1):.4f}")
    return tot / max(cnt, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    args = p.parse_args()
    run(args.epochs)
