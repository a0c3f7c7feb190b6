"""DNA convolution — just-in-time / dynamic neighbourhood aggregation
(Fey, 2019).

Reference counterpart: ``torch_geometric.nn.DNAConv`` (reference usage:
examples/dna.py:7,43-46 — heads=8, groups=16, cached=True).  Semantics:
node i holds its full layer history x_i^(1..L); each edge (j -> i)
computes multi-head scaled dot-product attention with query
q = W_q x_i^(L) and keys/values from x_j's history, then messages are
aggregated with GCN-style symmetric normalisation (self loops included).
Linear projections are *grouped* (block-diagonal weights, ``groups``).

TPU note: attention over the (static) layer axis L is a dense softmax —
no segment softmax needed; only the final aggregation is a weighted
segment sum.
"""

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm
from pytorch_geometric_tpu.nn.inits import kaiming_uniform, zeros
from pytorch_geometric_tpu.ops.segment import segment_sum


class _GroupedLinear(nn.Module):
    channels: int
    groups: int

    @nn.compact
    def __call__(self, x):
        g, c = self.groups, self.channels
        w = self.param("weight", kaiming_uniform, (g, c // g, c // g))
        b = self.param("bias", zeros, (c,))
        shape = x.shape
        xg = x.reshape(shape[:-1] + (g, c // g))
        out = jnp.einsum("...gi,gio->...go", xg, w)
        return out.reshape(shape[:-1] + (c,)) + b


class DNAConv(nn.Module):
    channels: int
    heads: int = 1
    groups: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: Graph, x_all, norm=None, *,
                 train: bool = False):
        """x_all: (N, L, C) layer history."""
        N, L, C = x_all.shape
        H = self.heads
        if norm is None:
            norm = gcn_norm(graph)

        q = _GroupedLinear(C, self.groups, name="lin_q")(x_all[:, -1])
        k = _GroupedLinear(C, self.groups, name="lin_k")(x_all)
        v = _GroupedLinear(C, self.groups, name="lin_v")(x_all)

        q = q.reshape(N, H, C // H)                  # (N, H, D)
        k = k.reshape(N, L, H, C // H)
        v = v.reshape(N, L, H, C // H)

        senders, receivers = norm.senders, norm.receivers
        q_i = jnp.take(q, receivers, axis=0)         # (E', H, D)
        k_j = jnp.take(k, senders, axis=0)           # (E', L, H, D)
        v_j = jnp.take(v, senders, axis=0)

        scores = jnp.einsum("ehd,elhd->elh", q_i, k_j) / math.sqrt(C // H)
        alpha = jax.nn.softmax(scores, axis=1)       # over layer history
        if self.dropout > 0 and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout,
                                        alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0.0)
        msg = jnp.einsum("elh,elhd->ehd", alpha, v_j).reshape(-1, C)
        msg = msg * norm.weights[:, None]
        return segment_sum(msg, receivers, N)        # (N, C)
