"""Relational GCN (Schlichtkrull et al.).

Reference counterpart: ``torch_geometric.nn.RGCNConv`` (reference usage:
examples/rgcn.py:6,18-25 — num_relations=90, num_bases=30, x=None
node-id embeddings).  Semantics (PyG 1.4.x, aggr='mean' per relation):
x'_i = W_root x_i + sum_r mean_{j in N_r(i)} W_r x_j, with basis
decomposition W_r = sum_b a_rb B_b.

TPU design — never gather a per-edge (F x C) matrix, never materialise
(E, B, C) messages (SURVEY §7 hard-parts list: "basis-combine after
aggregation"):

- x given: **relation-bucketed aggregation** — one fused segment-sum
  with ids ``receiver * R + relation`` builds Agg (N, R, F_in), then a
  single einsum with W = att @ basis collapses relations; 2 scatters +
  1 gather + 1 MXU contraction per layer regardless of R.
- x = None (node-id embeddings): precompute W_full = att @ basis as an
  (R, N_in, C) table once, gather one (E, C) row per edge by fused id
  ``relation * N_in + sender`` and segment-sum; 1 gather + 2 scatters.
"""

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.segment import segment_sum


def rgcn_norm(graph: Graph, edge_type, num_relations: int):
    """Static per-edge mean-normalisation weights 1/|N_r(i)| — depends
    only on the graph, so compute once and reuse across layers/epochs
    (the RGCN analog of gcn_norm's cached=True)."""
    R = num_relations
    et = edge_type.astype(jnp.int32)
    emask = graph.real_edge_mask()
    fused_rr = graph.receivers * R + et
    cnt = segment_sum(emask.astype(jnp.float32), fused_rr,
                      graph.num_nodes * R)
    inv = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
    return jnp.take(inv, fused_rr) * emask.astype(jnp.float32)


class RGCNConv(nn.Module):
    in_channels: int          # needed when x=None (embedding mode)
    out_channels: int
    num_relations: int
    num_bases: int = 0        # 0 = full per-relation weights
    root_weight: bool = True
    use_bias: bool = True

    def _shard_call(self, ctx, x):
        """Distributed relational conv over an edge partition
        (parallel/api.py — GraphPartition built with edge_type/
        num_relations): per-relation mean-norm weights route through
        the shared halo tables (parallel/partition.py halo_rgcn).
        Dense ``x`` only (the x=None embedding mode stays
        single-device)."""
        from pytorch_geometric_tpu.parallel.partition import halo_rgcn

        R, C = self.num_relations, self.out_channels
        F_in = x.shape[-1]
        if self.num_bases > 0:
            basis = self.param("basis", glorot,
                               (self.num_bases, F_in, C))
            att = self.param("att", glorot, (R, self.num_bases))
        else:
            basis = self.param("basis", glorot, (R, F_in, C))
            att = jnp.eye(R, dtype=x.dtype)
        root = self.param("root", glorot, (F_in, C)) \
            if self.root_weight else None
        wl = ctx.consts["rgcn_wl"]              # (R, El)
        wr = ctx.consts["rgcn_wr"]              # (R, Er)
        rel_weights = [(wl[r], wr[r]) for r in range(R)]
        out = halo_rgcn(x, basis, att, rel_weights,
                        ctx.consts["tables"], ctx.axis, ctx.halo_size,
                        ctx.num_peers, root=root)
        if self.use_bias:
            out = out + self.param("bias", zeros, (C,))
        return out

    @nn.compact
    def __call__(self, graph: Graph, x=None, edge_type=None, norm=None,
                 closure=None, fused_op=None, shard_ctx=None):
        if shard_ctx is not None:
            return self._shard_call(shard_ctx, x)
        """``fused_op``: an :class:`~pytorch_geometric_tpu.ops.embed_spmm.
        EmbedSpmm` bound to this graph's (fused id, receiver, norm)
        structure — replaces the take+segment_sum pair with a single
        table-SpMM whose backward is a sorted scatter (XLA's generic
        scatter-add for d(table) costs ~170 ns/edge vs ~20 sorted).
        The norm weights must be baked into the operator; build with
        ``rgcn_fused_op``."""
        if closure is not None:
            return self._closure_call(closure, x, norm)
        N, C, R = graph.num_nodes, self.out_channels, self.num_relations
        et = (edge_type if edge_type is not None
              else graph.edge_type).astype(jnp.int32)
        F_in = self.in_channels if x is None else x.shape[-1]

        B = self.num_bases if self.num_bases > 0 else R
        basis = self.param("basis", glorot, (B, F_in, C))
        att = self.param("att", glorot, (R, B)) if self.num_bases > 0 \
            else None

        # per-(receiver, relation) mean normalisation (static; pass a
        # precomputed rgcn_norm to hoist it out of the epoch loop)
        w_edge = norm if norm is not None else rgcn_norm(graph, et, R)

        if att is not None:
            W = jnp.einsum("rb,bfc->rfc", att, basis)     # (R, F_in, C)
        else:
            W = basis

        if fused_op is not None and att is not None:
            # basis-contraction aggregation (ops/embed_spmm.py
            # RgcnBasisSpmm): per-edge att[et] . xB[src]; all backward
            # scatters land in <= max(N, R) segments
            if x is None:
                xB2d = basis.transpose(1, 0, 2).reshape(F_in, B * C)
            else:
                xB2d = jnp.einsum(
                    "nf,bfc->nbc", x, basis,
                    preferred_element_type=jnp.float32).reshape(
                        N, B * C)
            out = fused_op(xB2d, att)
        elif x is None:
            # embedding mode: message = row senders[e] of W[et[e]] —
            # one fused-id gather from the (R * F_in, C) table
            table = W.reshape(R * F_in, C)
            rows = jnp.clip(graph.senders, 0, F_in - 1)
            msgs = jnp.take(table, et * F_in + rows, axis=0)
            out = segment_sum(msgs * w_edge[:, None],
                              graph.receivers, N)
        elif C < F_in:
            # transform-first: per-(node, relation) outputs are smaller
            # than inputs, so project before the per-edge gather
            H = jnp.einsum("nf,rfc->nrc", x, W,
                           preferred_element_type=jnp.float32)
            msgs = jnp.take(H.reshape(N * R, C),
                            graph.senders * R + et, axis=0)
            out = segment_sum(msgs * w_edge[:, None],
                              graph.receivers, N)
        else:
            # aggregate-first (relation-bucketed), basis-combine after
            fused_rr = graph.receivers * R + et
            x_j = jnp.take(x, graph.senders, axis=0) * w_edge[:, None]
            agg = segment_sum(x_j, fused_rr, N * R)       # (N*R, F_in)
            out = jnp.einsum("nrf,rfc->nc",
                             agg.reshape(N, R, F_in), W,
                             preferred_element_type=jnp.float32)

        if self.root_weight:
            w_root = self.param("root", glorot, (F_in, C))
            if x is None:
                root = jnp.take(w_root, jnp.clip(
                    jnp.arange(N), 0, F_in - 1), axis=0)
            else:
                root = jnp.dot(x, w_root,
                               preferred_element_type=jnp.float32)
            out = out + root
        if self.use_bias:
            out = out + self.param("bias", zeros, (C,))
        return out

    def _closure_call(self, cl, x, norm):
        """Bipartite/closure mode: features on ``cl.n_in`` input nodes
        -> ``cl.n_out`` output nodes, identical math to the full-graph
        path restricted to the seeds' receptive field
        (data/closure.py).  ``norm`` comes from ``rgcn_closure_norm``.
        """
        C, R = self.out_channels, self.num_relations
        F_in = self.in_channels if x is None else x.shape[-1]
        B = self.num_bases if self.num_bases > 0 else R
        basis = self.param("basis", glorot, (B, F_in, C))
        att = self.param("att", glorot, (R, B)) if self.num_bases > 0 \
            else None
        W = (jnp.einsum("rb,bfc->rfc", att, basis)
             if att is not None else basis)

        et = cl.edge_type
        w_edge = (norm if norm is not None
                  else rgcn_closure_norm(cl, R))
        n_out = cl.n_out

        if x is None:
            # embedding mode: rows are GLOBAL sender ids (the embedding
            # table is indexed by original node id)
            rows = jnp.clip(cl.sender_global, 0, F_in - 1)
            table = W.reshape(R * F_in, C)
            msgs = jnp.take(table, et * F_in + rows, axis=0)
            out = segment_sum(msgs * w_edge[:, None], cl.receivers,
                              n_out)
        elif C < F_in:
            H = jnp.einsum("nf,rfc->nrc", x, W,
                           preferred_element_type=jnp.float32)
            msgs = jnp.take(H.reshape(cl.n_in * R, C),
                            cl.senders * R + et, axis=0)
            out = segment_sum(msgs * w_edge[:, None], cl.receivers,
                              n_out)
        else:
            fused_rr = cl.receivers * R + et
            x_j = jnp.take(x, cl.senders, axis=0) * w_edge[:, None]
            agg = segment_sum(x_j, fused_rr, n_out * R)
            out = jnp.einsum("nrf,rfc->nc", agg.reshape(n_out, R, F_in),
                             W, preferred_element_type=jnp.float32)

        if self.root_weight:
            w_root = self.param("root", glorot, (F_in, C))
            if x is None:
                root = jnp.take(
                    w_root,
                    jnp.clip(cl.out_global, 0, F_in - 1), axis=0)
            else:
                x_out = jnp.take(x, cl.self_idx, axis=0)
                root = jnp.dot(x_out, w_root,
                               preferred_element_type=jnp.float32)
            out = out + root
        if self.use_bias:
            out = out + self.param("bias", zeros, (C,))
        return out


def rgcn_fused_op(graph: Graph, edge_type, num_relations: int,
                  mode: str, in_channels: int = None, norm=None,
                  backend: str = "xla", **kw):
    """Build the :class:`EmbedSpmm` for one RGCNConv layer.

    mode='embed'    — x=None layer: ids = relation * in_channels + sender
                      over the (R * in_channels, C) weight table.
    mode='transform'— transform-first layer: ids = sender * R + relation
                      over the (N * R, C) per-node-relation table.

    Mean normalisation (and padding-edge masking) is baked into the
    operator's static weights; pass a precomputed ``rgcn_norm`` to
    avoid recomputation.
    """
    import numpy as np

    from pytorch_geometric_tpu.ops.embed_spmm import RgcnBasisSpmm

    R = num_relations
    et = np.asarray(edge_type if edge_type is not None
                    else graph.edge_type).astype(np.int64)
    w = np.asarray(norm if norm is not None
                   else rgcn_norm(graph, jnp.asarray(et), R),
                   dtype=np.float32)
    s = np.asarray(graph.senders).astype(np.int64)
    r = np.asarray(graph.receivers).astype(np.int64)
    # drop the loader's padding edges at build time: their norm weight
    # is identically 0, but packed they cost real tiles (~20% of all
    # tiles on MUTAG, whose edge count pads 142k -> 196k)
    real = np.asarray(graph.real_edge_mask())
    if not real.all():
        s, r, et, w = s[real], r[real], et[real], w[real]
    N = graph.num_nodes
    src_rows = int(in_channels) if mode == "embed" else N
    if backend == "packed":
        # one-hot MXU gathers/scatters over packed edge tiles
        # (ops/packed_rgcn.py) — RCM-relabel the graph first
        from pytorch_geometric_tpu.ops.packed_rgcn import PackedRgcnSpmm
        return PackedRgcnSpmm(s, r, et, R, N, weights=w,
                              num_src_rows=src_rows, **kw)
    return RgcnBasisSpmm(s, r, et, R, N, weights=w,
                         num_src_rows=src_rows)


def rgcn_closure_norm(cl, num_relations: int):
    """Per-edge 1/|N_r(i)| weights for a ClosureLayer (static; compute
    once and pass as ``norm``).  Matches full-graph ``rgcn_norm`` on
    the closure's receivers because the closure keeps *all* in-edges
    of every needed node."""
    R = num_relations
    fused = cl.receivers * R + cl.edge_type
    m = cl.edge_mask.astype(jnp.float32)
    cnt = segment_sum(m, fused, cl.n_out * R)
    inv = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
    return jnp.take(inv, fused) * m
