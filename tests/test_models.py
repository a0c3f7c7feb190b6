"""GAE/VGAE + Infomax model tests (mirror of examples/autoencoder.py and
examples/infomax.py workloads on synthetic Cora)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import GCNConv
from pytorch_geometric_tpu.nn.models import (
    GAE,
    VGAE,
    DeepGraphInfomax,
    negative_sampling,
    split_edges,
)
from pytorch_geometric_tpu.nn.models.infomax import InfomaxHead


def cora_like(rng, n=100, e=400, f=16):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ei = ei[:, ei[0] != ei[1]]
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    return Data(x=rng.normal(size=(n, f)).astype(np.float32),
                edge_index=ei)


def test_split_edges_partition(rng):
    d = cora_like(rng)
    total_und = (d.edge_index[0] < d.edge_index[1]).sum()
    d = split_edges(d, val_ratio=0.1, test_ratio=0.2)
    nv = d.val_pos_edge_index.shape[1]
    nt = d.test_pos_edge_index.shape[1]
    ntr = d.train_pos_edge_index.shape[1] // 2
    assert nv + nt + ntr == total_und
    assert d.val_neg_edge_index.shape[1] == nv
    assert d.test_neg_edge_index.shape[1] == nt


def test_gae_train_improves_auc(rng):
    d = cora_like(rng)
    d = split_edges(d, seed=1)
    g = from_data(d)

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, graph, x):
            x = nn.relu(GCNConv(32)(graph, x))
            return GCNConv(16)(graph, x)

    enc = Encoder()
    params = enc.init(jax.random.PRNGKey(0), g, g.x)
    gae = GAE(lambda p, graph, x: enc.apply(p, graph, x))

    pos_s = jnp.asarray(d.train_pos_edge_index[0])
    pos_r = jnp.asarray(d.train_pos_edge_index[1])
    neg_s, neg_r = negative_sampling(
        d.train_pos_edge_index[0], d.train_pos_edge_index[1],
        d.num_nodes, pos_s.shape[0], seed=3)
    neg_s, neg_r = jnp.asarray(neg_s), jnp.asarray(neg_r)

    import optax
    tx = optax.adam(0.01)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss(p):
            z = gae.encode(p, g, g.x)
            return gae.recon_loss(z, pos_s, pos_r, neg_s, neg_r)
        l, grads = jax.value_and_grad(loss)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, l

    losses = []
    for _ in range(60):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # reconstruction improves
    # the random graph has no generalisable structure; check the model
    # can at least separate train positives from sampled negatives
    z = gae.encode(params, g, g.x)
    auc, ap = gae.test(z, pos_s, pos_r, neg_s, neg_r)
    assert auc > 0.7 and ap > 0.7


def test_vgae_kl_and_reparam(rng):
    mu = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    logstd = jnp.zeros((10, 4))
    v = VGAE(encoder_apply=None)
    z = v.reparametrize(mu, logstd, jax.random.PRNGKey(0))
    assert z.shape == mu.shape
    kl = float(v.kl_loss(mu, logstd))
    assert kl > 0
    # eval mode returns mu
    np.testing.assert_array_equal(
        np.asarray(v.reparametrize(mu, logstd, None, training=False)),
        np.asarray(mu))


def test_infomax_loss_decreases(rng):
    d = cora_like(rng)
    g = from_data(d)

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, graph, x):
            return nn.relu(GCNConv(16)(graph, x))

    def corruption(graph, x, rng_):
        perm = jax.random.permutation(rng_, x.shape[0])
        return graph, x[perm]

    class Model(nn.Module):
        @nn.compact
        def __call__(self, graph, x, rng):
            enc = Encoder()
            dgi = DeepGraphInfomax(hidden_channels=16, encoder=enc,
                                   corruption=corruption)
            pos_z, neg_z, s = dgi(graph, x, rng=rng)
            return InfomaxHead(hidden_channels=16)(pos_z, neg_z, s)

    m = Model()
    params = m.init(jax.random.PRNGKey(0), g, g.x, jax.random.PRNGKey(1))
    loss = m.apply(params, g, g.x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
