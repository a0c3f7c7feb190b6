"""DiffPool on ENZYMES — mirror of the reference's
examples/enzymes_diff_pool.py (ToDense pre_transform + DenseDataLoader,
DenseSAGEConv GNN blocks, dense_diff_pool hierarchy with link/entropy
aux losses)."""

import argparse
from math import ceil

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import DenseDataLoader
from pytorch_geometric_tpu.datasets import TUDataset
from pytorch_geometric_tpu.nn.conv import DenseSAGEConv
from pytorch_geometric_tpu.nn.pool import dense_diff_pool
from pytorch_geometric_tpu.transforms import ToDense

MAX_NODES = 126


class GNN(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, adj, mask=None):
        for i, ch in enumerate([self.hidden, self.hidden, self.out]):
            x = nn.relu(DenseSAGEConv(ch, normalize=True,
                                      name=f"conv{i}")(x, adj, mask))
        return x


class DiffPoolNet(nn.Module):
    num_classes: int
    hidden: int = 64

    @nn.compact
    def __call__(self, x, adj, mask):
        n1 = ceil(0.25 * MAX_NODES)
        s = GNN(self.hidden, n1, name="gnn1_pool")(x, adj, mask)
        z = GNN(self.hidden, self.hidden, name="gnn1_embed")(x, adj, mask)
        x, adj, l1, e1 = dense_diff_pool(z, adj, s, mask)

        n2 = ceil(0.25 * n1)
        s = GNN(self.hidden, n2, name="gnn2_pool")(x, adj)
        z = GNN(self.hidden, self.hidden, name="gnn2_embed")(x, adj)
        x, adj, l2, e2 = dense_diff_pool(z, adj, s)

        z = GNN(self.hidden, self.hidden, name="gnn3_embed")(x, adj)
        h = jnp.mean(z, axis=1)
        h = nn.relu(nn.Dense(self.hidden)(h))
        logits = nn.Dense(self.num_classes)(h)
        return logits, l1 + l2, e1 + e2


def run(epochs: int = 8, batch_size: int = 32, seed: int = 0):
    ds = TUDataset("datasets_cache_dense", "ENZYMES",
                   pre_transform=ToDense(MAX_NODES),
                   pre_filter=lambda d: d.num_nodes <= MAX_NODES)
    sh = ds.shuffle(seed=seed)
    n = len(sh)
    test_ds, train_ds = sh[: n // 10], sh[n // 10:]
    train_loader = DenseDataLoader(train_ds, batch_size=batch_size,
                                   shuffle=True, seed=seed)
    test_loader = DenseDataLoader(test_ds, batch_size=batch_size)

    model = DiffPoolNet(num_classes=6)
    b0 = next(iter(train_loader))
    params = model.init(jax.random.PRNGKey(seed), b0.x, b0.adj, b0.mask)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, x, adj, mask, y):
        def loss_fn(p):
            logits, ll, el = model.apply(p, x, adj, mask)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(
                logp, y.astype(jnp.int32)[:, None], axis=1).mean()
            return nll + ll + el
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def eval_step(params, x, adj, mask, y):
        logits, _, _ = model.apply(params, x, adj, mask)
        return jnp.sum(jnp.argmax(logits, 1) == y.astype(jnp.int32)), \
            y.shape[0]

    for epoch in range(1, epochs + 1):
        losses = []
        for b in train_loader:
            params, opt, loss = train_step(params, opt, b.x, b.adj,
                                           b.mask, b.y)
            losses.append(float(loss))
        cor = tot = 0
        for b in test_loader:
            c, t = eval_step(params, b.x, b.adj, b.mask, b.y)
            cor, tot = cor + int(c), tot + int(t)
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses):.4f}, "
              f"Test Acc: {cor / max(tot, 1):.4f}")
    return cor / max(tot, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=8)
    args = p.parse_args()
    run(args.epochs)
