"""Set2Set global readout (Vinyals et al.).

Reference counterpart: ``torch_geometric.nn.Set2Set`` (reference usage:
examples/qm9_nn_conv.py:9,78,91 — processing_steps=3).  Semantics:
LSTM(q*_{t-1}) -> q_t; alpha = softmax_i(x_i . q_t) per graph;
r_t = sum alpha_i x_i; q*_t = [q_t || r_t]; output q*_T (2F per graph).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.ops.segment import segment_softmax, segment_sum


class Set2Set(nn.Module):
    in_channels: int
    processing_steps: int

    @nn.compact
    def __call__(self, x, graph: Graph):
        N, F = x.shape
        G = graph.num_graphs
        batch = graph.batch if graph.batch is not None else \
            jnp.zeros((N,), jnp.int32)
        nm = graph.real_node_mask()

        lstm = nn.OptimizedLSTMCell(features=F)
        carry = lstm.initialize_carry(
            self.make_rng("params") if self.is_initializing()
            else jax.random.PRNGKey(0), (G, 2 * F))
        q_star = jnp.zeros((G, 2 * F), x.dtype)
        for _ in range(self.processing_steps):
            carry, q = lstm(carry, q_star)               # q: (G, F)
            e = jnp.sum(x * q[batch], axis=-1)           # (N,)
            alpha = segment_softmax(e, batch, G, mask=nm)
            r = segment_sum(x * alpha[:, None] *
                            nm[:, None].astype(x.dtype), batch, G)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star
