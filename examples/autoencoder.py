"""GAE/VGAE link prediction on Cora — mirror of the reference's
examples/autoencoder.py (GCN encoder, split_edges, recon/kl losses,
AUC/AP test)."""

import argparse

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets import Planetoid
from pytorch_geometric_tpu.nn.conv import GCNConv
from pytorch_geometric_tpu.nn.models import (
    GAE,
    VGAE,
    negative_sampling,
    split_edges,
)
from pytorch_geometric_tpu.transforms import NormalizeFeatures


class Encoder(nn.Module):
    out: int = 16
    variational: bool = False

    @nn.compact
    def __call__(self, graph, x):
        x = nn.relu(GCNConv(2 * self.out, name="conv1")(graph, x))
        mu = GCNConv(self.out, name="conv_mu")(graph, x)
        if not self.variational:
            return mu
        logstd = GCNConv(self.out, name="conv_logstd")(graph, x)
        return mu, logstd


def run(variational: bool = False, epochs: int = 100, seed: int = 0):
    ds = Planetoid("datasets_cache", "Cora",
                   transform=NormalizeFeatures())
    data = split_edges(ds[0].clone(), seed=seed)
    graph = from_data(data)

    enc = Encoder(variational=variational)
    params = enc.init(jax.random.PRNGKey(seed), graph, graph.x)
    ae = VGAE(lambda p, g, x: enc.apply(p, g, x)) if variational else \
        GAE(lambda p, g, x: enc.apply(p, g, x))

    import numpy as np
    pos_s = jnp.asarray(data.train_pos_edge_index[0])
    pos_r = jnp.asarray(data.train_pos_edge_index[1])
    neg_s_np, neg_r_np = negative_sampling(
        data.train_pos_edge_index[0], data.train_pos_edge_index[1],
        data.num_nodes, pos_s.shape[0], seed=seed + 1)
    neg_s, neg_r = jnp.asarray(neg_s_np), jnp.asarray(neg_r_np)

    tx = optax.adam(0.01)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            if variational:
                mu, logstd = enc.apply(p, graph, graph.x)
                z = ae.reparametrize(mu, logstd, key)
                loss = ae.recon_loss(z, pos_s, pos_r, neg_s, neg_r)
                loss = loss + ae.kl_loss(mu, logstd) / graph.num_nodes
            else:
                z = enc.apply(p, graph, graph.x)
                loss = ae.recon_loss(z, pos_s, pos_r, neg_s, neg_r)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.PRNGKey(seed)
    for epoch in range(1, epochs + 1):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if epoch % 20 == 0:
            z = enc.apply(params, graph, graph.x)
            if variational:
                z = z[0]
            auc, ap = ae.test(z, jnp.asarray(data.test_pos_edge_index[0]),
                              jnp.asarray(data.test_pos_edge_index[1]),
                              jnp.asarray(data.test_neg_edge_index[0]),
                              jnp.asarray(data.test_neg_edge_index[1]))
            print(f"Epoch {epoch:03d}, Loss {float(loss):.4f}, "
                  f"AUC: {auc:.4f}, AP: {ap:.4f}")
    return auc, ap


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--variational", action="store_true")
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args()
    run(args.variational, args.epochs)
