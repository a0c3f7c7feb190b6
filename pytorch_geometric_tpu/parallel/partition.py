"""Edge-partitioned multi-chip graphs with halo exchange.

The reference has nothing beyond single-process DataParallel (SURVEY
§2d); this is the TPU-native scaling path the north star requires:
graphs too big for one chip are node-partitioned, each chip owns a
block of nodes plus the edges *received* by its block, and boundary
("halo") source-node features are exchanged over ICI before the local
aggregation.

Host-side (numpy, loader-time): :func:`partition_graph` builds per-chip
edge shards and halo index tables with static (padded) shapes —
vectorised (one sort + one unique over the remote edges, no per-pair
passes), with optional RCM relabelling (utils/reorder.py) so blocks cut
few edges.

Device-side (inside shard_map), three SpMM strategies:

- ``halo_spmm``      — all_to_all of exactly the needed boundary rows
                       (padded per device pair: O(P^2 * Hmax) buffer).
                       Local edges aggregate BEFORE the remote ones are
                       consumed, so XLA overlaps the collective with the
                       local segment-sum.
- ``boundary_spmm``  — each device all_gathers the UNION of rows any
                       peer needs (O(P * Bmax) buffer — immune to
                       skewed pair sizes).  Same local/remote overlap.
- ``allgather_spmm`` — all_gather the full feature shard ring; the
                       fallback when the cut is dense.

All are differentiable end-to-end (XLA derives the collective
transposes), so the full train step runs under one jit.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.ops.segment import segment_sum


def _cdiv(a, b):
    return -(-a // b)


@dataclass(frozen=True)
class GraphShards:
    """Static edge partition over P devices (all arrays stacked on a
    leading P axis, ready for shard_map with P('graph') specs).

    Nodes are owned in contiguous blocks of the (optionally RCM-
    relabelled) id space: relabelled node g lives on device g // S at
    local row g % S.  ``perm`` maps new id -> original id (identity
    when locality reordering is off); :meth:`shard_nodes` /
    :meth:`unshard_nodes` apply it transparently.

    Edges are split into LOCAL (source owned by the same device) and
    REMOTE groups so the local aggregation can overlap the halo
    collective.
    """

    num_devices: int
    nodes_per_shard: int
    halo_size: int          # per-(q, p) halo row budget (all_to_all)
    boundary_size: int      # per-q boundary union budget (all_gather)
    num_local_edges: int    # padded per-device local edge count
    num_remote_edges: int
    perm: np.ndarray = field(repr=False)            # (N,) new -> old
    # local edges (P, El)
    loc_src_row: np.ndarray = field(repr=False)
    loc_dst: np.ndarray = field(repr=False)
    loc_mask: np.ndarray = field(repr=False)
    # remote edges (P, Er)
    rem_owner: np.ndarray = field(repr=False)       # source owner q
    rem_slot: np.ndarray = field(repr=False)        # slot in (q->p) halo
    rem_bslot: np.ndarray = field(repr=False)       # slot in q's boundary
    rem_src_row: np.ndarray = field(repr=False)     # owner-local row
    rem_dst: np.ndarray = field(repr=False)
    rem_mask: np.ndarray = field(repr=False)
    # send tables
    halo_send_idx: np.ndarray = field(repr=False)   # (P, P, H)
    halo_send_mask: np.ndarray = field(repr=False)
    boundary_send_idx: np.ndarray = field(repr=False)   # (P, B)
    boundary_send_mask: np.ndarray = field(repr=False)

    def device_arrays(self):
        return {k: jnp.asarray(getattr(self, k)) for k in (
            "loc_src_row", "loc_dst", "loc_mask", "rem_owner",
            "rem_slot", "rem_bslot", "rem_src_row", "rem_dst",
            "rem_mask", "halo_send_idx", "boundary_send_idx")}

    def shard_nodes(self, x: np.ndarray) -> np.ndarray:
        """(N, ...) original order -> (P, S, ...) relabelled + padded."""
        P, S = self.num_devices, self.nodes_per_shard
        x = np.asarray(x)
        out = np.zeros((P * S,) + x.shape[1:], dtype=x.dtype)
        out[: len(self.perm)] = x[self.perm]
        return out.reshape((P, S) + x.shape[1:])

    def unshard_nodes(self, x, num_nodes: int):
        flat = np.asarray(x).reshape((-1,) + np.asarray(x).shape[2:])
        out = np.empty((num_nodes,) + flat.shape[1:], flat.dtype)
        out[self.perm] = flat[:num_nodes]
        return out

    def comm_stats(self, feature_dim: int, dtype_bytes: int = 4):
        """Exact per-step halo-exchange volume of this partition
        (VERDICT round 4, item 4).  The all_to_all moves the PADDED
        (P, H, F) send buffer from every device; the real payload is
        the masked rows.  Bytes are per device per halo exchange (one
        per aggregate; a K-layer forward does K exchanges, the
        backward K more via the collective transposes)."""
        P, H = self.num_devices, self.halo_size
        real_rows = self.halo_send_mask.sum(axis=(1, 2))     # (P,)
        padded_rows = P * H
        row_bytes = feature_dim * dtype_bytes
        loc = self.loc_mask.sum()
        rem = self.rem_mask.sum()
        return {
            "num_devices": P,
            "halo_rows_padded_per_dev": int(padded_rows),
            "halo_rows_real_max": int(real_rows.max()) if P else 0,
            "halo_rows_real_mean": float(real_rows.mean()) if P else 0.,
            "halo_bytes_padded_per_dev": int(padded_rows * row_bytes),
            "halo_bytes_real_max": int(real_rows.max() * row_bytes),
            "padding_fraction": float(
                1.0 - real_rows.mean() / max(padded_rows, 1)),
            "cut_fraction": float(rem / max(rem + loc, 1)),
        }


def _group_fill(values, group, num_groups, width, fill=0):
    """Scatter ``values`` (sorted by group) into (num_groups, width)."""
    counts = np.bincount(group, minlength=num_groups)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(values)) - starts[group]
    out = np.full((num_groups, width), fill, values.dtype)
    out[group, pos] = values
    return out, counts, pos


def partition_graph(senders, receivers, num_nodes: int, num_devices: int,
                    edge_weights=None, locality: bool = True,
                    pad_multiple: int = 8
                    ) -> Tuple[GraphShards, Tuple[np.ndarray, np.ndarray]]:
    """Node-blocked edge partition (receiver's owner gets the edge).

    ``locality=True`` relabels nodes with reverse Cuthill–McKee first so
    contiguous blocks cut few edges (utils/reorder.py); the returned
    shards carry the permutation and apply it in shard/unshard.

    Returns (shards, (w_local, w_remote)) — the caller's edge weights
    routed to their shard slots ((P, El) and (P, Er) float32, zeros on
    padding slots, so padding contributes nothing without masks).
    ``edge_weights`` may also be an (E, K) STACK of K weight vectors;
    then the routed arrays are (K, P, El) / (K, P, Er) and every
    weighting shares one slot assignment by construction (so callers
    with several weightings — GCN norm + mean + per-relation — never
    depend on cross-call determinism).

    Fully vectorised: one sort over the edges, one unique over the
    remote edges — a 100k-node graph partitions in well under a second.
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    w = np.ones(senders.shape[0], np.float32) if edge_weights is None \
        else np.asarray(edge_weights, np.float32)
    stacked = w.ndim == 2
    if not stacked:
        w = w[:, None]                      # (E, 1)
    K = w.shape[1]
    P = num_devices
    N = int(num_nodes)
    if locality and N > P:
        from pytorch_geometric_tpu.utils.reorder import rcm_permutation
        perm = np.asarray(rcm_permutation(senders, receivers, N))
    else:
        perm = np.arange(N)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    s = inv[senders]
    r = inv[receivers]
    S = _cdiv(N, P)

    own_dst = (r // S).astype(np.int64)
    own_src = (s // S).astype(np.int64)
    is_local = own_src == own_dst

    def pad_w(n):
        return max(_cdiv(max(n, 1), pad_multiple) * pad_multiple, 1)

    # ---- local edges: sort by owner, scatter into (P, El)
    li = np.flatnonzero(is_local)
    lorder = li[np.argsort(own_dst[li], kind="stable")]
    lgrp = own_dst[lorder]
    El = pad_w(int(np.bincount(lgrp, minlength=P).max()) if len(lorder)
               else 1)
    loc_src_row, _, lpos = _group_fill((s[lorder] % S).astype(np.int32),
                                       lgrp, P, El)
    loc_dst = np.zeros((P, El), np.int32)
    loc_dst[lgrp, lpos] = (r[lorder] % S).astype(np.int32)
    loc_mask = np.zeros((P, El), bool)
    loc_mask[lgrp, lpos] = True
    w_local = np.zeros((K, P, El), np.float32)
    w_local[:, lgrp, lpos] = w[lorder].T

    # ---- remote edges: sort by (dst owner, src), one unique pass
    ri = np.flatnonzero(~is_local)
    rkey = own_dst[ri] * N + s[ri]
    rorder = ri[np.argsort(rkey, kind="stable")]
    rp = own_dst[rorder]
    rs = s[rorder]
    rq = own_src[rorder]

    uniq, einv = np.unique(rp * N + rs, return_inverse=True)
    up = uniq // N                   # dst owner per unique halo row
    us = uniq % N                    # global src id
    uq = us // S                     # src owner
    # slot of each unique row within its (q -> p) halo list: uniq is
    # sorted by (p, s) and q is monotone in s, so (p, q) groups are
    # contiguous runs
    pair = up * P + uq
    pair_change = np.concatenate([[True], pair[1:] != pair[:-1]])
    run_start = np.maximum.accumulate(
        np.where(pair_change, np.arange(len(pair)), 0))
    uslot = np.arange(len(pair)) - run_start
    H = pad_w(int(uslot.max()) + 1 if len(uslot) else 1)

    halo_send_idx = np.zeros((P, P, H), np.int32)
    halo_send_mask = np.zeros((P, P, H), bool)
    halo_send_idx[uq, up, uslot] = (us % S).astype(np.int32)
    halo_send_mask[uq, up, uslot] = True

    # boundary union per source device q: unique src ids, grouped by q
    bsrc = np.unique(us)
    bq = bsrc // S
    bstart = np.concatenate(
        [[0], np.cumsum(np.bincount(bq, minlength=P))[:-1]])
    bslot_of = np.arange(len(bsrc)) - bstart[bq]
    B = pad_w(int(np.bincount(bq, minlength=P).max()) if len(bsrc)
              else 1)
    boundary_send_idx = np.zeros((P, B), np.int32)
    boundary_send_mask = np.zeros((P, B), bool)
    boundary_send_idx[bq, bslot_of] = (bsrc % S).astype(np.int32)
    boundary_send_mask[bq, bslot_of] = True
    # boundary slot per unique halo row (us is a subset order of bsrc)
    ub = bslot_of[np.searchsorted(bsrc, us)]

    Er = pad_w(int(np.bincount(rp, minlength=P).max()) if len(rorder)
               else 1)
    rem_owner, _, rpos = _group_fill(uq[einv].astype(np.int32), rp, P, Er)
    rem_slot = np.zeros((P, Er), np.int32)
    rem_slot[rp, rpos] = uslot[einv].astype(np.int32)
    rem_bslot = np.zeros((P, Er), np.int32)
    rem_bslot[rp, rpos] = ub[einv].astype(np.int32)
    rem_src_row = np.zeros((P, Er), np.int32)
    rem_src_row[rp, rpos] = (rs % S).astype(np.int32)
    rem_dst = np.zeros((P, Er), np.int32)
    rem_dst[rp, rpos] = (r[rorder] % S).astype(np.int32)
    rem_mask = np.zeros((P, Er), bool)
    rem_mask[rp, rpos] = True
    w_remote = np.zeros((K, P, Er), np.float32)
    w_remote[:, rp, rpos] = w[rorder].T
    if not stacked:
        w_local, w_remote = w_local[0], w_remote[0]

    shards = GraphShards(
        num_devices=P, nodes_per_shard=S, halo_size=H, boundary_size=B,
        num_local_edges=El, num_remote_edges=Er, perm=perm,
        loc_src_row=loc_src_row, loc_dst=loc_dst, loc_mask=loc_mask,
        rem_owner=rem_owner, rem_slot=rem_slot, rem_bslot=rem_bslot,
        rem_src_row=rem_src_row, rem_dst=rem_dst, rem_mask=rem_mask,
        halo_send_idx=halo_send_idx, halo_send_mask=halo_send_mask,
        boundary_send_idx=boundary_send_idx,
        boundary_send_mask=boundary_send_mask)
    return shards, (w_local, w_remote)


# --- device-side (call inside shard_map over axis `axis`) -----------------

def _local_part(x_local, w_local, tables, S):
    msgs = jnp.take(x_local, tables["loc_src_row"], axis=0) \
        * w_local[:, None]
    return segment_sum(msgs, tables["loc_dst"], S)


def halo_spmm(x_local, weights, tables, axis: str, halo_size: int,
              num_peers: int):
    """out[r] = sum_e w_e x[src_e]; remote rows via all_to_all of the
    per-pair halo lists.  ``weights`` = (w_local, w_remote) rows for
    this device.  The local aggregation issues before the remote rows
    are consumed, so the collective overlaps it."""
    S, F = x_local.shape
    w_local, w_remote = weights
    send_buf = jnp.take(x_local, tables["halo_send_idx"].reshape(-1),
                        axis=0).reshape(num_peers, halo_size, F)
    recv = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                              concat_axis=0, tiled=False)
    out = _local_part(x_local, w_local, tables, S)
    flat = recv.reshape(num_peers * halo_size, F)
    src = tables["rem_owner"] * halo_size + tables["rem_slot"]
    msgs = jnp.take(flat, src, axis=0) * w_remote[:, None]
    return out + segment_sum(msgs, tables["rem_dst"], S)


def boundary_spmm(x_local, weights, tables, axis: str,
                  boundary_size: int):
    """Remote rows via all_gather of each device's boundary UNION —
    buffer O(P * Bmax) instead of O(P^2 * Hmax); the right choice when
    pair sizes are skewed."""
    S, F = x_local.shape
    w_local, w_remote = weights
    send_buf = jnp.take(x_local, tables["boundary_send_idx"], axis=0)
    recv = jax.lax.all_gather(send_buf, axis)       # (P, B, F)
    out = _local_part(x_local, w_local, tables, S)
    flat = recv.reshape(-1, F)
    src = tables["rem_owner"] * boundary_size + tables["rem_bslot"]
    msgs = jnp.take(flat, src, axis=0) * w_remote[:, None]
    return out + segment_sum(msgs, tables["rem_dst"], S)


def allgather_spmm(x_local, weights, tables, axis: str):
    """Fallback: all_gather the full feature matrix then local SpMM."""
    S, F = x_local.shape
    w_local, w_remote = weights
    x_full = jax.lax.all_gather(x_local, axis)      # (P, S, F)
    out = _local_part(x_local, w_local, tables, S)
    flat = x_full.reshape(-1, F)
    src = tables["rem_owner"] * S + tables["rem_src_row"]
    msgs = jnp.take(flat, src, axis=0) * w_remote[:, None]
    return out + segment_sum(msgs, tables["rem_dst"], S)


def _halo_rows(x_local, tables, axis: str, halo_size: int,
               num_peers: int):
    """all_to_all the per-pair halo feature rows; returns the flat
    (num_peers * halo_size, F) receive buffer plus a gather-index
    builder for remote edges."""
    F = x_local.shape[1]
    send_buf = jnp.take(x_local, tables["halo_send_idx"].reshape(-1),
                        axis=0).reshape(num_peers, halo_size, F)
    recv = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                              concat_axis=0, tiled=False)
    flat = recv.reshape(num_peers * halo_size, F)
    src = tables["rem_owner"] * halo_size + tables["rem_slot"]
    return flat, src


def halo_spmm_max(x_local, tables, axis: str, halo_size: int,
                  num_peers: int):
    """out[r] = max_e x[src_e] across partition boundaries (the ``aggr
    = 'max'`` choice of SAGE/PointConv/EdgeConv — reference
    gmm_conv.py:55-58 aggr choices, examples/pointnet2.py).  Masked
    (padding) edges contribute -inf; receivers with no edge anywhere
    end at 0, matching the single-device segment-max semantics."""
    S, F = x_local.shape
    lmask = tables["loc_mask"][:, None]
    msgs = jnp.where(lmask, jnp.take(x_local, tables["loc_src_row"],
                                     axis=0), -jnp.inf)
    out = jax.ops.segment_max(msgs, tables["loc_dst"], num_segments=S)
    flat, src = _halo_rows(x_local, tables, axis, halo_size, num_peers)
    rmask = tables["rem_mask"][:, None]
    rmsgs = jnp.where(rmask, jnp.take(flat, src, axis=0), -jnp.inf)
    out = jnp.maximum(out, jax.ops.segment_max(
        rmsgs, tables["rem_dst"], num_segments=S))
    return jnp.where(jnp.isneginf(out), 0.0, out)


def halo_spmm_mean(x_local, weights, tables, axis: str, halo_size: int,
                   num_peers: int):
    """Mean aggregation across partition boundaries: the halo-sum
    divided by the per-receiver edge count (padding edges carry weight
    0 in ``weights``, so counts come from the same weight rows)."""
    w_local, w_remote = weights
    num = halo_spmm(x_local, weights, tables, axis, halo_size,
                    num_peers)
    ones = jnp.ones((x_local.shape[0], 1), x_local.dtype)
    den = halo_spmm(ones, weights, tables, axis, halo_size, num_peers)
    return num / jnp.maximum(den, 1e-12)


def halo_rgcn(x_local, basis, comb, rel_weights, tables, axis: str,
              halo_size: int, num_peers: int, root=None):
    """Distributed relational conv over the edge partition.

    out_i = sum_r sum_{j in N_r(i)} norm_e x_j W_r (+ x_i W_root),
    with basis decomposition W_r = sum_b comb[r, b] B_b (reference
    RGCNConv semantics, examples/rgcn.py:18-25; nn/conv/rgcn_conv.py).

    TPU-native distribution: the relation enters through the per-edge
    WEIGHT routing — ``rel_weights`` is a list of (w_local, w_remote)
    rows per relation (norm weights masked to that relation's edges,
    routed by :func:`partition_graph`).  The halo features are
    exchanged ONCE (x rides the collective, not R per-relation
    transforms — R x less ICI traffic); each relation is then a local
    weighted aggregation of the shared buffers, and the basis combine
    is one dense einsum AFTER aggregation (the "basis-combine after
    aggregation" rule, SURVEY §7).  Differentiable end-to-end.
    """
    R = comb.shape[0]
    S = x_local.shape[0]
    W = jnp.einsum("rb,bfc->rfc", comb, basis)       # (R, F, C)
    flat, src = _halo_rows(x_local, tables, axis, halo_size,
                           num_peers)
    x_loc_rows = jnp.take(x_local, tables["loc_src_row"], axis=0)
    x_rem_rows = jnp.take(flat, src, axis=0)
    aggs = []
    for r in range(R):
        wl, wr = rel_weights[r]
        agg = segment_sum(x_loc_rows * wl[:, None],
                          tables["loc_dst"], S)
        agg = agg + segment_sum(x_rem_rows * wr[:, None],
                                tables["rem_dst"], S)
        aggs.append(agg)
    out = jnp.einsum("rsf,rfc->sc", jnp.stack(aggs), W)
    if root is not None:
        out = out + x_local @ root
    return out


def halo_gat(h_local, a_src_local, a_dst_local, tables, axis: str,
             halo_size: int, num_peers: int, heads: int,
             negative_slope: float = 0.2):
    """Distributed GAT attention layer over the edge partition.

    Segment-softmax across partition boundaries WITHOUT a distributed
    max pass: the per-head global shift M_h = max_i a_src[i] +
    max_j a_dst[j] (leaky_relu is monotone, so leaky(M) bounds every
    logit — the packed_gat trick, ops/packed_gat.py) needs only one
    scalar pmax per head.  Numerator and denominator are then plain
    weighted halo sums with locally computed weights
    w_e = exp(leaky(a_src[s] + a_dst[r]) - M), so the ONLY collective
    beyond the shift is the same single halo feature exchange the
    weighted-sum path uses (a_src rides along with h).

    Args: ``h_local`` (S, H*C) per-head features, ``a_src/dst_local``
    (S, H) attention half-logits.  Returns (S, H*C) aggregated,
    un-normalised heads concatenated (softmax denominator applied).
    Differentiable end-to-end (XLA derives the collective transposes).

    Residual underflow window (same as ops/packed_gat.py, ADVICE round
    4): the shift uses the GLOBAL pmax of ``a_src``, so a receiver
    whose best incoming sender logit sits more than ~37 (f32 exp
    range) below that max still underflows; the ``den`` guard then
    returns exactly-0 output for that node (finite gradients) instead
    of its true attention average.  Use a per-receiver segment-max of
    incoming logits when exactness matters at extreme logit spreads.
    """
    S = h_local.shape[0]
    H = heads
    C = h_local.shape[1] // H
    # PER-RECEIVER per-head shift m_i = leaky(pmax(max_j a_src_j) +
    # a_dst_i): bounds every incoming logit of node i (leaky is
    # monotone) while keeping each node's exp alive — a GLOBAL shift
    # underflows entire nodes' denominators at wide head dims
    # (ops/packed_gat.py, measured).  One scalar pmax per head is the
    # only collective; the shift carries no gradient.
    max_s = jax.lax.pmax(jax.lax.stop_gradient(
        jnp.max(a_src_local, axis=0)), axis)           # (H,)
    m_row = jax.lax.stop_gradient(jax.nn.leaky_relu(
        max_s[None, :] + a_dst_local, negative_slope))  # (S, H)

    def edge_weights(a_s_rows, dst_idx, mask):
        z = a_s_rows + jnp.take(a_dst_local, dst_idx, axis=0)   # (E, H)
        z = jax.nn.leaky_relu(z, negative_slope) \
            - jnp.take(m_row, dst_idx, axis=0)
        return jnp.exp(z) * mask[:, None]

    def accumulate(h_rows, a_s_rows, dst_idx, mask):
        w = edge_weights(a_s_rows, dst_idx, mask)       # (E, H)
        hh = h_rows.reshape(-1, H, C)
        num = segment_sum((hh * w[:, :, None]).reshape(-1, H * C),
                          dst_idx, S)
        den = segment_sum(w, dst_idx, S)                # (S, H)
        return num, den

    # local edges first (overlaps the all_to_all below)
    h_loc = jnp.take(h_local, tables["loc_src_row"], axis=0)
    a_loc = jnp.take(a_src_local, tables["loc_src_row"], axis=0)
    num, den = accumulate(h_loc, a_loc, tables["loc_dst"],
                          tables["loc_mask"].astype(h_local.dtype))

    # remote edges: a_src rides along with h in ONE exchange
    payload = jnp.concatenate([a_src_local, h_local], axis=1)
    flat, src = _halo_rows(payload, tables, axis, halo_size, num_peers)
    rows = jnp.take(flat, src, axis=0)
    num_r, den_r = accumulate(rows[:, H:], rows[:, :H],
                              tables["rem_dst"],
                              tables["rem_mask"].astype(h_local.dtype))
    num = num + num_r
    den = den + den_r                                   # (S, H)
    # underflow guard on the H-wide den only (ops/packed_gat.py call):
    # vanished nodes output ~0 with finite gradients
    den = jnp.where(den < 1e-16, 1.0, den)
    return (num.reshape(S, H, C) / den[:, :, None]).reshape(S, H * C)
