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

Dense mode (``adj=...`` built by :func:`gat_dense_adj`): for small padded
graphs the sparse path is latency-bound (one gather/scatter kernel per
segment op per layer), so instead materialise the (H, N, N) masked logit
tensor, row-softmax it, and aggregate with one batched MXU matmul — the
same trade that makes the dense GCN path ~3x the sparse one on Cora.
N^2·H memory; callers opt in below ~4k padded nodes.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import glorot, zeros
from pytorch_geometric_tpu.ops.segment import segment_softmax, segment_sum


def gat_dense_adj(graph: Graph, add_self_loops: bool = True) -> jnp.ndarray:
    """Boolean (N, N) mask with ``adj[i, j] = True`` iff edge j -> i.

    Padding edges are excluded; self loops (which GATConv adds on the
    sparse path too) guarantee every row — padding nodes included — has
    at least one valid entry, so the masked row-softmax never sees an
    all-(-inf) row.
    """
    n = graph.num_nodes
    mask = graph.real_edge_mask()
    adj = jnp.zeros((n, n), jnp.bool_)
    adj = adj.at[graph.receivers, graph.senders].max(mask)
    if add_self_loops:
        adj = adj | jnp.eye(n, dtype=jnp.bool_)
    return adj


class GATConv(nn.Module):
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    use_bias: bool = True
    add_self_loops: bool = True
    # fused-backend-only: return the raw (N, H*C + H) num‖den kernel
    # accumulator (bias param still created, NOT added) so the caller
    # can gather loss rows before the narrow-lane division chain
    raw_out: bool = False

    @nn.compact
    def __call__(self, graph: Graph, x, *, train: bool = False,
                 adj: Optional[jnp.ndarray] = None, flash_op=None,
                 closure=None, shard_ctx=None):
        H, C = self.heads, self.out_channels
        if self.raw_out and (closure is not None or adj is not None
                             or flash_op is None):
            # raw_out semantics (caller divides num/den + adds bias) only
            # exist on the fused path; returning the finalized output here
            # would make the caller divide twice and double-add the bias.
            raise ValueError(
                "GATConv(raw_out=True) requires the fused flash_op path "
                "(no closure/adj); the other paths return finalized "
                "output and would silently break raw semantics")
        if closure is not None:
            return self._closure_call(closure, x, train)
        if shard_ctx is not None:
            return self._shard_call(shard_ctx, x)
        N = graph.num_nodes

        weight = self.param("weight", glorot, (x.shape[-1], H * C))
        att_src = self.param("att_src", glorot, (1, H, C))
        att_dst = self.param("att_dst", glorot, (1, H, C))

        if flash_op is not None:
            # fused Pallas path (ops/packed_gat.py et al.): one kernel
            # fwd, one bwd; dropout bits regenerated in-kernel from the
            # seed.  The whole path stays 2-D: the (N, H, C) reshape the
            # other paths use forces XLA into an (8, 128)-padded 3-D
            # layout whose backward materialises a ~374 us relayout copy
            # per step at PubMed scale, so the per-head alpha reductions
            # are expressed as (HC, H) block-diagonal matmuls instead.
            h2 = jnp.dot(x, weight,
                         preferred_element_type=jnp.float32)   # (N, HC)
            blk = jnp.asarray(np.kron(np.eye(H, dtype=np.float32),
                                      np.ones((C, 1), np.float32)))
            alpha_src = jnp.dot(h2, att_src.reshape(H * C, 1) * blk,
                                preferred_element_type=jnp.float32)  # (N, H)
            alpha_dst = jnp.dot(h2, att_dst.reshape(H * C, 1) * blk,
                                preferred_element_type=jnp.float32)
            if self.dropout > 0 and train:
                rng = self.make_rng("dropout")
                seed = jax.random.randint(rng, (), 0, 1 << 20)
                kw = dict(rate=self.dropout)
                seed = seed.astype(jnp.float32)
            else:
                kw, seed = dict(rate=0.0), 0.0
            if self.raw_out:
                acc = flash_op(alpha_dst, alpha_src, h2, seed,
                               raw_out=True, **kw)
                if self.use_bias:   # param-shape parity with _finalize2d
                    self.param("bias", zeros,
                               (H * C,) if self.concat else (C,))
                return acc
            out = flash_op(alpha_dst, alpha_src, h2, seed, **kw)
            return self._finalize2d(out, H, C)

        h = jnp.dot(x, weight,
                    preferred_element_type=jnp.float32).reshape(N, H, C)
        alpha_src = jnp.sum(h * att_src, axis=-1)   # (N, H)
        alpha_dst = jnp.sum(h * att_dst, axis=-1)

        if adj is not None:
            out = self._dense_attention(h, alpha_src, alpha_dst, adj,
                                        train)
            return self._finalize(out, N, H, C)

        senders, receivers = graph.senders, graph.receivers
        if self.add_self_loops:
            loop = jnp.arange(N, dtype=senders.dtype)
            senders = jnp.concatenate([senders, loop])
            receivers = jnp.concatenate([receivers, loop])

        logits = (jnp.take(alpha_src, senders, axis=0)
                  + jnp.take(alpha_dst, receivers, axis=0))   # (E', H)
        logits = jax.nn.leaky_relu(logits, self.negative_slope)
        # No padding-edge mask needed: padding edges point at the padding
        # node, so they normalise within the padding segment only.  But
        # PyG 1.4 GATConv does remove_self_loops THEN add_self_loops, so
        # pre-existing self edges must not get a second softmax slot:
        # mask the originals to -inf (exp -> 0) instead of compacting.
        if self.add_self_loops:
            E0 = graph.senders.shape[0]
            dup = (senders == receivers).at[E0:].set(False)
            logits = jnp.where(dup[:, None], -1e9, logits)
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

        return self._finalize(out, N, H, C)

    def _shard_call(self, ctx, x):
        """Distributed attention over an edge partition
        (parallel/api.py): per-head half-logits are computed locally,
        the segment-softmax crosses partition boundaries via
        ``halo_gat`` (parallel/partition.py — one scalar pmax per head
        plus the single halo feature exchange).  The partition's edges
        must carry NO pre-existing self loops (GraphPartition appends
        them, matching PyG's remove-then-add semantics).  Attention
        dropout is not applied on this path."""
        from pytorch_geometric_tpu.parallel.partition import halo_gat

        H, C = self.heads, self.out_channels
        weight = self.param("weight", glorot, (x.shape[-1], H * C))
        att_src = self.param("att_src", glorot, (1, H, C))
        att_dst = self.param("att_dst", glorot, (1, H, C))
        h2 = jnp.dot(x, weight, preferred_element_type=jnp.float32)
        blk = jnp.asarray(np.kron(np.eye(H, dtype=np.float32),
                                  np.ones((C, 1), np.float32)))
        alpha_src = jnp.dot(h2, att_src.reshape(H * C, 1) * blk,
                            preferred_element_type=jnp.float32)
        alpha_dst = jnp.dot(h2, att_dst.reshape(H * C, 1) * blk,
                            preferred_element_type=jnp.float32)
        out = halo_gat(h2, alpha_src, alpha_dst, ctx.consts["tables"],
                       ctx.axis, ctx.halo_size, ctx.num_peers, H,
                       self.negative_slope)
        return self._finalize2d(out, H, C)

    def _closure_call(self, cl, x, train):
        """Bipartite/closure mode (data/closure.py): attention over the
        seeds' receptive field only.  Correct because segment-softmax
        normalises over each receiver's in-edges and the closure keeps
        *all* in-edges of every output node; self-loops are appended
        per output node via ``self_idx``, matching PyG's
        remove-then-add semantics (existing self edges are masked).
        """
        H, C = self.heads, self.out_channels
        n_in, n_out = cl.n_in, cl.n_out

        weight = self.param("weight", glorot, (x.shape[-1], H * C))
        h = jnp.dot(x, weight,
                    preferred_element_type=jnp.float32).reshape(
                        n_in, H, C)
        att_src = self.param("att_src", glorot, (1, H, C))
        att_dst = self.param("att_dst", glorot, (1, H, C))
        alpha_src = jnp.sum(h * att_src, axis=-1)          # (n_in, H)
        alpha_dst = jnp.sum(h * att_dst, axis=-1)

        if self.add_self_loops:
            senders = jnp.concatenate([cl.senders, cl.self_idx])
            receivers = jnp.concatenate(
                [cl.receivers,
                 jnp.arange(n_out, dtype=cl.receivers.dtype)])
        else:
            senders, receivers = cl.senders, cl.receivers
        logits = (jnp.take(alpha_src, senders, axis=0)
                  + jnp.take(alpha_dst, receivers, axis=0))
        logits = jax.nn.leaky_relu(logits, self.negative_slope)
        # padding edges are masked unconditionally; with self loops on,
        # pre-existing self edges are masked too (their appended copy is
        # the one softmax slot PyG's remove-then-add semantics keeps)
        drop = ~cl.edge_mask
        if self.add_self_loops:
            dup = (cl.sender_global
                   == jnp.take(cl.out_global, cl.receivers))
            drop = drop | dup
            drop = jnp.concatenate(
                [drop, jnp.zeros(n_out, dtype=bool)])
        logits = jnp.where(drop[:, None], -1e9, logits)

        alpha = segment_softmax(logits, receivers, n_out)
        if self.dropout > 0 and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout,
                                        alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0.0)
        msgs = jnp.take(h, senders, axis=0) * alpha[..., None]
        out = segment_sum(msgs, receivers, n_out)          # (n_out,H,C)
        return self._finalize(out, n_out, H, C)

    def _dense_attention(self, h, alpha_src, alpha_dst, adj, train):
        """(H, N, N) masked row-softmax + one batched matmul on the MXU.

        Head-major layout keeps the big tensor's trailing two dims the
        (N, N) plane — (N, N, H) with H=8 would waste 16x in (8, 128)
        tile padding.  The whole N^2 chain runs in bf16: this path is
        HBM-bound (each materialised (H, N, N) tensor is a full pass),
        so halving the element size halves the epoch.  Row sums over
        ~N bf16 terms cost ~0.5% relative error — attention weights
        don't need more (parity test tolerance 2e-2).
        """
        logits = (alpha_dst.T[:, :, None].astype(jnp.bfloat16)
                  + alpha_src.T[:, None, :].astype(jnp.bfloat16))
        logits = jax.nn.leaky_relu(logits, self.negative_slope)
        # -1e4 underflows exp() while staying far from bf16 limits
        logits = jnp.where(adj[None], logits, -1e4)       # (H, N, N)
        alpha = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0 and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout,
                                        alpha.shape)
            alpha = jnp.where(keep,
                              alpha / jnp.bfloat16(1.0 - self.dropout),
                              jnp.bfloat16(0.0))
        out = jnp.einsum(
            "hij,hjc->hic", alpha,
            h.astype(jnp.bfloat16).transpose(1, 0, 2),
            preferred_element_type=jnp.float32)           # (H, N, C)
        return out.transpose(1, 0, 2)                     # (N, H, C)

    def _finalize2d(self, out, H, C):
        """Head concat/mean + bias on a flat (N, H*C) block — no 3-D
        layout.  Head-mean is a constant (HC, C) matmul; H == 1 is a
        no-op."""
        if not self.concat:
            if H > 1:
                mean_mat = jnp.asarray(
                    np.tile(np.eye(C, dtype=np.float32), (H, 1)) / H)
                out = jnp.dot(out, mean_mat,
                              preferred_element_type=jnp.float32)
            bias_shape = (C,)
        else:
            bias_shape = (H * C,)
        if self.use_bias:
            out = out + self.param("bias", zeros, bias_shape)
        return out

    def _finalize(self, out, N, H, C):
        if self.concat:
            out = out.reshape(N, H * C)
            bias_shape = (H * C,)
        else:
            out = out.mean(axis=1)
            bias_shape = (C,)
        if self.use_bias:
            out = out + self.param("bias", zeros, bias_shape)
        return out
