"""Graph autoencoders.

Reference counterpart: ``torch_geometric.nn.GAE`` / ``VGAE`` (reference
usage: examples/autoencoder.py:8,43-65 — ``split_edges``, ``recon_loss``,
``kl_loss``, ``test`` returning (AUC, AP)).

Host/device split: ``split_edges`` and negative sampling are loader-time
numpy (dynamic output sizes); encoding/decoding/losses are pure jax.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.data.data import Data

EPS = 1e-15


class InnerProductDecoder:
    """sigma(z_i . z_j) edge probabilities."""

    def __call__(self, z, senders, receivers, sigmoid: bool = True):
        value = jnp.sum(jnp.take(z, senders, axis=0)
                        * jnp.take(z, receivers, axis=0), axis=-1)
        return jax.nn.sigmoid(value) if sigmoid else value

    def forward_all(self, z, sigmoid: bool = True):
        adj = jnp.dot(z, z.T)
        return jax.nn.sigmoid(adj) if sigmoid else adj


def negative_sampling(senders, receivers, num_nodes, num_neg,
                      seed: int = 0):
    """Sample edges absent from the graph (host numpy)."""
    rng = np.random.default_rng(seed)
    existing = set((int(s) * num_nodes + int(r))
                   for s, r in zip(np.asarray(senders),
                                   np.asarray(receivers)))
    out_s, out_r = [], []
    while len(out_s) < num_neg:
        cand_s = rng.integers(0, num_nodes, size=num_neg)
        cand_r = rng.integers(0, num_nodes, size=num_neg)
        for s, r in zip(cand_s, cand_r):
            if s != r and (int(s) * num_nodes + int(r)) not in existing:
                out_s.append(int(s))
                out_r.append(int(r))
                if len(out_s) == num_neg:
                    break
    return (np.asarray(out_s, dtype=np.int64),
            np.asarray(out_r, dtype=np.int64))


def split_edges(data: Data, val_ratio: float = 0.05,
                test_ratio: float = 0.1, seed: int = 0) -> Data:
    """Reference ``GAE.split_edges`` semantics
    (examples/autoencoder.py:43): keep one direction of each undirected
    edge, split into train/val/test positive sets, sample negative
    val/test edges, and store train_pos edges both directions."""
    rng = np.random.default_rng(seed)
    ei = np.asarray(data.edge_index)
    n = data.num_nodes
    mask = ei[0] < ei[1]
    s, r = ei[0][mask], ei[1][mask]
    perm = rng.permutation(len(s))
    s, r = s[perm], r[perm]

    n_v = int(np.floor(val_ratio * len(s)))
    n_t = int(np.floor(test_ratio * len(s)))
    data.val_pos_edge_index = np.stack([s[:n_v], r[:n_v]])
    data.test_pos_edge_index = np.stack([s[n_v:n_v + n_t],
                                         r[n_v:n_v + n_t]])
    tr_s, tr_r = s[n_v + n_t:], r[n_v + n_t:]
    data.train_pos_edge_index = np.stack(
        [np.concatenate([tr_s, tr_r]), np.concatenate([tr_r, tr_s])])

    neg_s, neg_r = negative_sampling(ei[0], ei[1], n, n_v + n_t, seed)
    data.val_neg_edge_index = np.stack([neg_s[:n_v], neg_r[:n_v]])
    data.test_neg_edge_index = np.stack([neg_s[n_v:], neg_r[n_v:]])
    data.edge_index = data.train_pos_edge_index
    return data


class GAE:
    """Non-variational graph autoencoder: wraps a flax encoder module."""

    def __init__(self, encoder_apply: Callable,
                 decoder: Optional[InnerProductDecoder] = None):
        self.encode = encoder_apply
        self.decoder = decoder or InnerProductDecoder()

    def recon_loss(self, z, pos_senders, pos_receivers,
                   neg_senders=None, neg_receivers=None, seed: int = 0):
        pos = self.decoder(z, pos_senders, pos_receivers)
        pos_loss = -jnp.mean(jnp.log(pos + EPS))
        if neg_senders is None:
            neg_senders, neg_receivers = negative_sampling(
                np.asarray(pos_senders), np.asarray(pos_receivers),
                z.shape[0], int(np.asarray(pos_senders).shape[0]), seed)
            neg_senders = jnp.asarray(neg_senders)
            neg_receivers = jnp.asarray(neg_receivers)
        neg = self.decoder(z, neg_senders, neg_receivers)
        neg_loss = -jnp.mean(jnp.log(1.0 - neg + EPS))
        return pos_loss + neg_loss

    def test(self, z, pos_senders, pos_receivers, neg_senders,
             neg_receivers) -> Tuple[float, float]:
        """(AUC, AP) over positive/negative edge sets
        (examples/autoencoder.py:65)."""
        from sklearn.metrics import (
            average_precision_score,
            roc_auc_score,
        )
        pos = np.asarray(self.decoder(z, pos_senders, pos_receivers))
        neg = np.asarray(self.decoder(z, neg_senders, neg_receivers))
        y = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
        pred = np.concatenate([pos, neg])
        return (float(roc_auc_score(y, pred)),
                float(average_precision_score(y, pred)))


class VGAE(GAE):
    """Variational GAE: encoder returns (mu, logstd)."""

    MAX_LOGSTD = 10.0

    def reparametrize(self, mu, logstd, rng, training: bool = True):
        if not training:
            return mu
        logstd = jnp.clip(logstd, max=self.MAX_LOGSTD)
        return mu + jax.random.normal(rng, mu.shape) * jnp.exp(logstd)

    def kl_loss(self, mu, logstd):
        logstd = jnp.clip(logstd, max=self.MAX_LOGSTD)
        return -0.5 * jnp.mean(jnp.sum(
            1 + 2 * logstd - mu ** 2 - jnp.exp(logstd) ** 2, axis=1))
