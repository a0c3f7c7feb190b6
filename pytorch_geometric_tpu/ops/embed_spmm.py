"""Table-gather SpMM with a sorted-scatter backward.

The RGCN hot path (reference examples/rgcn.py:18-25 semantics) is

    out[r] = sum_{e -> r} w_e * table[id_e]        # (T, C) table

with static per-edge ids (relation * width + sender for the embedding
layer, sender * R + relation for the transform-first layer).  XLA's
autodiff of ``take`` emits a GENERIC scatter-add for d(table) —
measured ~170 ns/edge on v5e (25 of the 26 ms of a full-graph MUTAG
RGCN epoch).  This operator keeps the forward identical but rewrites
the backward as SORTED segment-sums over host-precomputed edge orders
(~20 ns/edge):

    d table[i] = sum_{e: id_e == i} w_e * g[recv_e]
               = segment_sum(w[by_id] * g[recv[by_id]], id[by_id])
    d w_e      = <table[id_e], g[recv_e]>           (if weights traced)

Everything order-related is numpy at build time; the device arrays are
small E-sized int32 constants.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class RgcnBasisSpmm:
    """Basis-decomposed relational aggregation with small-segment
    backward scatters.

    Forward (per edge e: src -> recv with relation et and static norm
    weight w):

        out[i] = sum_{e -> i} w_e * sum_b att[et_e, b] * xB[src_e, b, :]

    where ``xB`` is the per-node per-basis projection ((N, B*C) —
    ``basis`` itself for the x=None embedding layer, ``x @ basis`` for
    dense inputs).  Crucially, EVERY scatter in both directions targets
    at most max(N, R) segments: the measured v5e cost of an XLA
    scatter-add grows with the segment-space size (10 ms into R*N=1.1M
    segments vs 1 ms into N=23.6k for the same 142k edges), which is
    what made the (relation-fused id) formulations slow.
    """

    def __init__(self, senders, receivers, edge_type,
                 num_relations: int, num_nodes: int, weights,
                 num_src_rows: int = None):
        s = np.asarray(senders, dtype=np.int64)
        r = np.asarray(receivers, dtype=np.int64)
        et = np.asarray(edge_type, dtype=np.int64)
        w = np.asarray(weights, np.float32)
        self.num_nodes = int(num_nodes)
        self.num_src_rows = int(num_src_rows if num_src_rows is not None
                                else num_nodes)
        num_nodes = self.num_src_rows   # clip target for src indexing
        self.num_relations = int(num_relations)
        # sorted edge orders for every scatter direction (an unsorted
        # XLA scatter-add costs ~9x a sorted one at this scale)
        o_recv = np.argsort(r, kind="stable")
        o_src = np.argsort(s, kind="stable")
        o_et = np.argsort(et, kind="stable")
        self._s = jnp.asarray(
            np.clip(s, 0, num_nodes - 1)[o_recv], jnp.int32)
        self._r = jnp.asarray(r[o_recv], jnp.int32)
        self._et = jnp.asarray(et[o_recv], jnp.int32)
        self._w = jnp.asarray(w[o_recv])
        self._o_src = {k: jnp.asarray(v[o_src], jnp.int32) for k, v in
                       (("s", np.clip(s, 0, num_nodes - 1)), ("r", r),
                        ("et", et))}
        self._w_src = jnp.asarray(w[o_src])
        self._o_et = {k: jnp.asarray(v[o_et], jnp.int32) for k, v in
                      (("s", np.clip(s, 0, num_nodes - 1)), ("r", r),
                       ("et", et))}
        self._w_et = jnp.asarray(w[o_et])
        self._call = self._build()

    def _build(self):
        N, R = self.num_nodes, self.num_relations
        NS = self.num_src_rows
        s, r, et, w = self._s, self._r, self._et, self._w
        osrc, wsrc = self._o_src, self._w_src
        oet, wet = self._o_et, self._w_et

        @jax.custom_vjp
        def f(xB2d, att):
            B = att.shape[1]
            C = xB2d.shape[1] // B
            ae = jnp.take(att, et, axis=0)              # (E, B)
            xbe = jnp.take(xB2d, s, axis=0)             # (E, B*C)
            # broadcast-multiply + axis-sum: E-batched (1,B)x(B,C)
            # einsums lower as tiny batched matmuls and crawl on TPU
            msg = jnp.sum(ae[:, :, None] * xbe.reshape(-1, B, C),
                          axis=1)                       # (E, C)
            return jax.ops.segment_sum(msg * w[:, None], r,
                                       num_segments=N,
                                       indices_are_sorted=True)

        def f_fwd(xB2d, att):
            return f(xB2d, att), (xB2d, att)

        def f_bwd(res, g):
            xB2d, att = res
            B = att.shape[1]
            C = xB2d.shape[1] // B
            # d xB: scatter by SOURCE (N segments, src-sorted edges)
            ge = jnp.take(g, osrc["r"], axis=0) * wsrc[:, None]  # (E,C)
            ae = jnp.take(att, osrc["et"], axis=0)               # (E,B)
            dxbe = (ae[:, :, None] * ge[:, None, :])   # (E, B, C)
            dxB = jax.ops.segment_sum(
                dxbe.reshape(-1, B * C), osrc["s"], num_segments=NS,
                indices_are_sorted=True)
            # d att: scatter by RELATION (R segments, et-sorted edges)
            ge2 = jnp.take(g, oet["r"], axis=0) * wet[:, None]
            xbe2 = jnp.take(xB2d, oet["s"], axis=0).reshape(-1, B, C)
            dae = jnp.sum(xbe2 * ge2[:, None, :], axis=2)  # (E, B)
            datt = jax.ops.segment_sum(dae, oet["et"], num_segments=R,
                                       indices_are_sorted=True)
            return dxB, datt

        f.defvjp(f_fwd, f_bwd)
        return f

    def __call__(self, xB2d, att):
        return self._call(xB2d, att)


class EmbedSpmm:
    """out = segment_sum(w * table[ids], receivers, num_out).

    Differentiable in ``table`` (and in ``weights`` when passed traced
    to ``__call__``; the static-weights form binds them at build time).
    """

    def __init__(self, ids, receivers, num_table_rows: int,
                 num_out: int, weights: Optional[np.ndarray] = None,
                 indices_are_sorted: bool = False):
        ids = np.asarray(ids, dtype=np.int64)
        receivers = np.asarray(receivers, dtype=np.int64)
        self.num_table_rows = int(num_table_rows)
        self.num_out = int(num_out)
        self._sorted_fwd = indices_are_sorted
        # backward order: edges sorted by table id
        order = np.argsort(ids, kind="stable")
        self._ids = jnp.asarray(ids, jnp.int32)
        self._recv = jnp.asarray(receivers, jnp.int32)
        self._ids_by_id = jnp.asarray(ids[order], jnp.int32)
        self._recv_by_id = jnp.asarray(receivers[order], jnp.int32)
        self._w_np = None if weights is None else np.asarray(
            weights, np.float32)
        self._w = None if weights is None else jnp.asarray(self._w_np)
        self._w_by_id = None if weights is None else jnp.asarray(
            self._w_np[order])
        self._call = self._build()

    def _build(self):
        ids, recv = self._ids, self._recv
        ids_s, recv_s = self._ids_by_id, self._recv_by_id
        w, w_s = self._w, self._w_by_id
        T, N = self.num_table_rows, self.num_out
        sorted_fwd = self._sorted_fwd

        @jax.custom_vjp
        def f(table):
            msgs = jnp.take(table, ids, axis=0)
            if w is not None:
                msgs = msgs * w[:, None]
            return jax.ops.segment_sum(msgs, recv, num_segments=N,
                                       indices_are_sorted=sorted_fwd)

        def f_fwd(table):
            return f(table), None

        def f_bwd(_, g):
            gm = jnp.take(g, recv_s, axis=0)
            if w_s is not None:
                gm = gm * w_s[:, None]
            dt = jax.ops.segment_sum(gm, ids_s, num_segments=T,
                                     indices_are_sorted=True)
            return (dt,)

        f.defvjp(f_fwd, f_bwd)
        return f

    def __call__(self, table):
        return self._call(table)
