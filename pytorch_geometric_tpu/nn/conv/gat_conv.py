"""GAT convolution (Veličković et al.).

Reference counterpart: ``torch_geometric.nn.GATConv`` (reference usage:
examples/gat.py:7,22-28 — heads=8, dropout on attention;
examples/ppi.py:7,22-27 — heads=4/6, concat control).

Semantics (PyG 1.4.x): h = x W (per head); per-edge logits
e_ij = LeakyReLU(a_src . h_i + a_dst . h_j); alpha = segment-softmax over
each target's incoming edges; out_i = sum_j alpha_ij h_j; heads concat or
mean; bias added after.

TPU notes: the per-edge score needs only two gathered *scalars* per head
(a_src.h and a_dst.h are precomputed per node), so the SDDMM collapses to
gathers the XLA fuses; the softmax is the two-pass segment max/sum pair
(reference call stack SURVEY §3.2), masked against padding edges.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.segment import segment_softmax, segment_sum


class GATConv(nn.Module):
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    use_bias: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False):
        H, C = self.heads, self.out_channels
        N = graph.num_nodes

        weight = self.param("weight", glorot, (x.shape[-1], H * C))
        h = jnp.dot(x, weight,
                    preferred_element_type=jnp.float32).reshape(N, H, C)

        att_src = self.param("att_src", glorot, (1, H, C))
        att_dst = self.param("att_dst", glorot, (1, H, C))
        alpha_src = jnp.sum(h * att_src, axis=-1)   # (N, H)
        alpha_dst = jnp.sum(h * att_dst, axis=-1)

        senders, receivers = graph.senders, graph.receivers
        if self.add_self_loops:
            loop = jnp.arange(N, dtype=senders.dtype)
            senders = jnp.concatenate([senders, loop])
            receivers = jnp.concatenate([receivers, loop])

        logits = (jnp.take(alpha_src, senders, axis=0)
                  + jnp.take(alpha_dst, receivers, axis=0))   # (E', H)
        logits = jax.nn.leaky_relu(logits, self.negative_slope)
        # No edge mask needed: padding edges point at the padding node,
        # so they normalise within the padding segment only.
        E2 = senders.shape[0]
        if self.dropout > 0 and train:
            # dropout applies to the *normalised* alpha (PyG semantics),
            # so the denominator needs its own pass
            alpha = segment_softmax(logits, receivers, N)
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout,
                                        alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0.0)
            msgs = jnp.take(h, senders, axis=0) * alpha[..., None]
            out = segment_sum(msgs, receivers, N)             # (N, H, C)
        else:
            # fused path: one segment-sum carries both the weighted
            # messages and the softmax denominator (halves the scatter
            # count — scatters dominate small-graph epochs on TPU)
            seg_max = jax.ops.segment_max(
                jax.lax.stop_gradient(logits), receivers,
                num_segments=N, indices_are_sorted=False)
            seg_max = jnp.where(jnp.isneginf(seg_max), 0.0, seg_max)
            expv = jnp.exp(logits - jnp.take(seg_max, receivers,
                                             axis=0))          # (E', H)
            weighted = jnp.take(h, senders, axis=0) * expv[..., None]
            fused = jnp.concatenate(
                [weighted.reshape(E2, H * C), expv], axis=1)
            summed = segment_sum(fused, receivers, N)         # (N, HC+H)
            denom = jnp.maximum(summed[:, H * C:], 1e-16)
            out = summed[:, : H * C].reshape(N, H, C) / denom[..., None]

        if self.concat:
            out = out.reshape(N, H * C)
            bias_shape = (H * C,)
        else:
            out = out.mean(axis=1)
            bias_shape = (C,)
        if self.use_bias:
            out = out + self.param("bias", zeros, bias_shape)
        return out
