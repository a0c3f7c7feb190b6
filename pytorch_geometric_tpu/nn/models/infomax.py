"""Deep Graph Infomax (Veličković et al.).

Reference counterpart: the hand-built Infomax of examples/infomax.py:49-67
(encoder + corruption + bilinear discriminator + readout, with
``nn.inits.uniform`` weight init at :42).  Packaged as a flax module like
upstream PyG's ``DeepGraphInfomax``.
"""

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.nn.inits import uniform


class DeepGraphInfomax(nn.Module):
    hidden_channels: int
    encoder: Callable     # flax module: (graph, x) -> (N, H)
    corruption: Callable  # (graph, x, rng) -> (graph', x')
    summary: Callable = None  # (z) -> (H,), default sigmoid(mean)

    @nn.compact
    def __call__(self, graph, x, *, rng=None):
        pos_z = self.encoder(graph, x)
        rng = rng if rng is not None else self.make_rng("corruption")
        cor_graph, cor_x = self.corruption(graph, x, rng)
        neg_z = self.encoder(cor_graph, cor_x)
        if self.summary is None:
            s = jax.nn.sigmoid(jnp.mean(pos_z, axis=0))
        else:
            s = self.summary(pos_z)
        return pos_z, neg_z, s

    def discriminate(self, z, summary, weight):
        return z @ weight @ summary


def infomax_loss_fn(pos_z, neg_z, summary, weight):
    """BCE discriminator loss (examples/infomax.py:55-60)."""
    eps = 1e-15
    pos = jax.nn.sigmoid(pos_z @ weight @ summary)
    neg = jax.nn.sigmoid(neg_z @ weight @ summary)
    return -jnp.mean(jnp.log(pos + eps)) - jnp.mean(jnp.log(1 - neg + eps))


class InfomaxHead(nn.Module):
    """Bilinear discriminator weight holder (uniform init, matching
    examples/infomax.py:42)."""

    hidden_channels: int

    @nn.compact
    def __call__(self, pos_z, neg_z, summary):
        w = self.param("weight", uniform(self.hidden_channels),
                       (self.hidden_channels, self.hidden_channels))
        return infomax_loss_fn(pos_z, neg_z, summary, w)
