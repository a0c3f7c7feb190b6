"""GraphSAGE convolutions — sparse and dense variants.

Reference counterparts: ``torch_geometric.nn.SAGEConv`` and
``DenseSAGEConv`` (reference usage: examples/enzymes_diff_pool.py:9,49-53
uses the dense form inside DiffPool blocks).  Semantics (PyG 1.4.x):
x' = W . mean_{j in N(i) ∪ {i}} x_j (+ b), optional L2 normalisation.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.nn.message_passing import propagate


class SAGEConv(nn.Module):
    out_channels: int
    normalize: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, shard_ctx=None):
        # PyG 1.4.3 SAGEConv (concat=False): out = W . mean over
        # neighbours *including self*: (sum_j x_j + x_i) / (deg_i + 1).
        if shard_ctx is not None:
            # distributed path (parallel/api.py): the 'mean' weighting
            # carries 1/(deg+1) over the self-loop-augmented edges, so
            # one fast halo SpMM IS the self-inclusive mean
            mean = shard_ctx.aggregate("mean", x)
        else:
            ew = graph.real_edge_mask().astype(x.dtype)
            s = propagate(graph, x, aggr="add", edge_weight=ew)
            from pytorch_geometric_tpu.utils.degree import degree
            deg = degree(graph.receivers, graph.num_nodes,
                         dtype=x.dtype, mask=graph.edge_mask)
            mean = (s + x) / (deg + 1.0)[:, None]
        weight = self.param("weight", glorot,
                            (x.shape[-1], self.out_channels))
        out = jnp.dot(mean, weight, preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,))
        if self.normalize:
            out = out * jax.lax.rsqrt(
                jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12)
        return out


class DenseSAGEConv(nn.Module):
    """Dense-adjacency SAGE used inside DiffPool blocks
    (examples/enzymes_diff_pool.py:49-53).  Input: x (B, N, F),
    adj (B, N, N), optional mask (B, N)."""

    out_channels: int
    normalize: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, adj, mask=None):
        if x.ndim == 2:
            x, adj = x[None], adj[None]
        B, N, F = x.shape
        # include self: A + I
        eye = jnp.eye(N, dtype=adj.dtype)[None]
        a = adj + eye
        s = jnp.einsum("bij,bjf->bif", a, x)
        deg = jnp.sum(a, axis=-1, keepdims=True)
        mean = s / jnp.maximum(deg, 1.0)
        weight = self.param("weight", glorot, (F, self.out_channels))
        out = jnp.einsum("bif,fo->bio", mean, weight)
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,))
        if self.normalize:
            # rsqrt form: zero rows (masked nodes) get zero output with a
            # finite gradient, unlike norm-division (NaN at 0)
            out = out * jax.lax.rsqrt(
                jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out
