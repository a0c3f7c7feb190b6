"""AGNN convolution (Thekumparampil et al.).

Reference counterpart: ``torch_geometric.nn.AGNNConv`` (reference usage:
examples/agnn.py:7,19-20 — requires_grad flag; ConvexPruning.py:236-237).
Semantics: P_ij = softmax_j(beta * cos(x_i, x_j)) over N(i) ∪ {i};
x' = P x.  beta trainable iff requires_grad.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.ops.segment import segment_softmax, segment_sum


class AGNNConv(nn.Module):
    requires_grad: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x):
        N = graph.num_nodes
        if self.requires_grad:
            beta = self.param("beta", lambda k, s: jnp.ones(s), (1,))
        else:
            beta = jnp.ones((1,), x.dtype)

        loop = jnp.arange(N, dtype=graph.senders.dtype)
        senders = jnp.concatenate([graph.senders, loop])
        receivers = jnp.concatenate([graph.receivers, loop])
        mask = jnp.concatenate(
            [graph.real_edge_mask(), jnp.ones((N,), dtype=bool)])

        xn = x * jax.lax.rsqrt(
            jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        cos = jnp.sum(jnp.take(xn, senders, axis=0)
                      * jnp.take(xn, receivers, axis=0), axis=-1)
        alpha = segment_softmax(beta[0] * cos, receivers, N, mask=mask)
        msgs = jnp.take(x, senders, axis=0) * alpha[:, None]
        return segment_sum(msgs, receivers, N)
