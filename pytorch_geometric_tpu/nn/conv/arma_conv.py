"""ARMA convolution (Bianchi et al.).

Reference counterpart: ``torch_geometric.nn.ARMAConv`` (reference usage:
examples/arma.py:7,19-34 — num_stacks=3, num_layers=2, shared_weights,
internal dropout 0.25).  Semantics (PyG 1.4.x):

  x_k^(t+1) = act(L^ x_k^(t) W_k^(t) + x^(0) V_k^(t)),
  L^ = D^-1/2 A D^-1/2 (no self loops), output = mean over K stacks.

shared_weights ties W/V across t >= 1.  Dropout applies to the skip
input x^(0) projection at every layer.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.segment import segment_sum
from pytorch_geometric_tpu.ops.spmm import spmm


class ARMAConv(nn.Module):
    out_channels: int
    num_stacks: int = 1
    num_layers: int = 1
    shared_weights: bool = False
    dropout: float = 0.0
    use_bias: bool = True
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, graph: Graph, x, edge_weight=None, *,
                 train: bool = False):
        N, F, K = graph.num_nodes, x.shape[-1], self.num_stacks
        C = self.out_channels
        if edge_weight is None:
            edge_weight = graph.real_edge_mask().astype(x.dtype)
        deg = segment_sum(edge_weight, graph.receivers, N)
        dis = jnp.where(deg > 0, jnp.maximum(deg, 1e-12) ** -0.5, 0.0)
        lap_w = dis[graph.senders] * edge_weight * dis[graph.receivers]

        def drop(v):
            if self.dropout > 0 and train:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1.0 - self.dropout,
                                            v.shape)
                return jnp.where(keep, v / (1.0 - self.dropout), 0.0)
            return v

        n_w = 1 if self.shared_weights else self.num_layers
        w_init = self.param("init_weight", glorot, (K, F, C))
        w_deep = self.param("weight", glorot, (max(n_w - 1, 1), K, C, C)) \
            if self.num_layers > 1 else None
        v_skip = self.param("root_weight", glorot, (n_w, K, F, C))
        bias = self.param("bias", zeros, (self.num_layers if not
                                          self.shared_weights else 1, K, 1,
                                          C)) if self.use_bias else None

        # x_k^(1) from x^(0)
        out = jnp.einsum("nf,kfc->knc", x, w_init)
        out = jnp.stack([
            spmm(graph.senders, graph.receivers, out[k], N, weights=lap_w,
                 indices_are_sorted=graph.edges_sorted)
            for k in range(K)])
        root = jnp.einsum("nf,kfc->knc", drop(x), v_skip[0])
        out = out + root
        if bias is not None:
            out = out + bias[0]
        out = self.act(out)

        for t in range(1, self.num_layers):
            wi = 0 if self.shared_weights else t - 1
            vi = 0 if self.shared_weights else t
            bi = 0 if self.shared_weights else t
            h = jnp.einsum("knc,kcd->knd", out, w_deep[wi])
            h = jnp.stack([
                spmm(graph.senders, graph.receivers, h[k], N,
                     weights=lap_w,
                     indices_are_sorted=graph.edges_sorted)
                for k in range(K)])
            h = h + jnp.einsum("nf,kfc->knc", drop(x), v_skip[vi])
            if bias is not None:
                h = h + bias[bi]
            out = self.act(h)

        return out.mean(axis=0)
