"""Deep Graph Infomax on Cora — mirror of the reference's
examples/infomax.py (PReLU-GCN encoder, feature-shuffle corruption,
bilinear discriminator, then logistic-regression evaluation)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets import Planetoid
from pytorch_geometric_tpu.nn.conv import GCNConv
from pytorch_geometric_tpu.nn.models import DeepGraphInfomax
from pytorch_geometric_tpu.nn.models.infomax import InfomaxHead


class Encoder(nn.Module):
    hidden: int = 512

    @nn.compact
    def __call__(self, graph, x):
        x = GCNConv(self.hidden)(graph, x)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
        return jnp.where(x > 0, x, alpha * x)


class Model(nn.Module):
    hidden: int = 512

    @nn.compact
    def __call__(self, graph, x, rng):
        def corruption(g, xx, r):
            perm = jax.random.permutation(r, xx.shape[0])
            return g, xx[perm]

        dgi = DeepGraphInfomax(hidden_channels=self.hidden,
                               encoder=Encoder(self.hidden),
                               corruption=corruption)
        pos_z, neg_z, s = dgi(graph, x, rng=rng)
        loss = InfomaxHead(hidden_channels=self.hidden)(pos_z, neg_z, s)
        return loss, pos_z


def run(epochs: int = 50, seed: int = 0, hidden: int = 512):
    ds = Planetoid("datasets_cache", "Cora")
    graph = from_data(ds[0])
    model = Model(hidden)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, graph, graph.x, key)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.apply(p, graph, graph.x, key),
            has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for epoch in range(1, epochs + 1):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if epoch % 10 == 0:
            print(f"Epoch {epoch:03d}, Loss: {float(loss):.4f}")

    _, z = model.apply(params, graph, graph.x, key)
    z = np.asarray(z)
    from sklearn.linear_model import LogisticRegression
    nm = np.asarray(graph.node_mask)
    y = np.asarray(graph.y)
    tr = np.asarray(graph.train_mask) & nm
    te = np.asarray(graph.test_mask) & nm
    clf = LogisticRegression(max_iter=300).fit(z[tr], y[tr])
    acc = clf.score(z[te], y[te])
    print(f"LogReg test accuracy: {acc:.4f}")
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args()
    run(args.epochs)
