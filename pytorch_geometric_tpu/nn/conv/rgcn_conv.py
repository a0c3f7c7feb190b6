"""Relational GCN (Schlichtkrull et al.).

Reference counterpart: ``torch_geometric.nn.RGCNConv`` (reference usage:
examples/rgcn.py:6,18-25 — num_relations=90, num_bases=30, x=None
node-id embeddings).  Semantics (PyG 1.4.x, aggr='mean' per relation):
x'_i = W_root x_i + sum_r mean_{j in N_r(i)} W_r x_j, with basis
decomposition W_r = sum_b a_rb B_b.

TPU design: never gather a per-edge (F x C) matrix.  With bases, project
x through each basis once (B dense matmuls, MXU), gather the per-edge
basis-combined message as a_r[edge_type] . basis_msgs — an (E, B) x
(B, C) contraction after the gather; per-relation mean normalisation is
a segment count per (receiver, relation) pair, computed as a segment sum
over a fused index r * N + i (static num_segments = R * N would blow up;
instead normalise by per-edge inverse counts gathered from a
(receiver, relation)-keyed count).
"""

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.segment import segment_sum


class RGCNConv(nn.Module):
    in_channels: int          # needed when x=None (embedding mode)
    out_channels: int
    num_relations: int
    num_bases: int = 0        # 0 = full per-relation weights
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x=None, edge_type=None):
        N, C, R = graph.num_nodes, self.out_channels, self.num_relations
        et = edge_type if edge_type is not None else graph.edge_type
        et = et.astype(jnp.int32)
        emask = graph.real_edge_mask()

        if x is None:
            # node-id one-hot: W_r acts as per-relation embedding table
            x = None
            F_in = self.in_channels
        else:
            F_in = x.shape[-1]

        B = self.num_bases if self.num_bases > 0 else R
        basis = self.param("basis", glorot, (B, F_in, C))
        if self.num_bases > 0:
            att = self.param("att", glorot, (R, B))
        else:
            att = None

        # per-(receiver, relation) edge count for mean normalisation
        fused = graph.receivers * R + et
        cnt = segment_sum(emask.astype(jnp.float32), fused, N * R)
        inv_cnt = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
        w_edge = jnp.take(inv_cnt, fused) * emask.astype(jnp.float32)

        if x is None:
            # one-hot node-id features: the message for edge e is row
            # senders[e] of W_{et[e]} — gather basis rows per edge, then
            # basis-combine (clip guards padding nodes >= F_in).
            rows = jnp.clip(graph.senders, 0, F_in - 1)
            if att is not None:
                a_e = jnp.take(att, et, axis=0)             # (E, B)
                hb = jnp.take(basis, rows, axis=1)          # (B, E, C)
                msgs = jnp.einsum("eb,bec->ec", a_e, hb)
            else:
                msgs = basis[et, rows]
        else:
            # basis messages: x -> each basis once, then combine per edge
            hb = jnp.einsum("nf,bfc->nbc", x, basis)        # (N, B, C)
            hj = jnp.take(hb, graph.senders, axis=0)        # (E, B, C)
            if att is not None:
                a_e = jnp.take(att, et, axis=0)             # (E, B)
                msgs = jnp.einsum("eb,ebc->ec", a_e, hj)
            else:
                msgs = jnp.take_along_axis(
                    hj, et[:, None, None], axis=1)[:, 0, :]
        out = segment_sum(msgs * w_edge[:, None], graph.receivers, N)

        if self.root_weight:
            w = self.param("root", glorot, (F_in, C))
            if x is None:
                root = jnp.take(w, jnp.clip(
                    jnp.arange(N), 0, F_in - 1), axis=0)
            else:
                root = jnp.dot(x, w, preferred_element_type=jnp.float32)
            out = out + root
        if self.use_bias:
            out = out + self.param("bias", zeros, (C,))
        return out
