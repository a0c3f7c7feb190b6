"""Edge-partitioned multi-chip graphs with halo exchange.

The reference has nothing beyond single-process DataParallel (SURVEY
§2d); this is the TPU-native scaling path the north star requires:
graphs too big for one chip are node-partitioned, each chip owns a
contiguous node block plus the edges *received* by its block, and
boundary ("halo") source-node features are exchanged over ICI before the
local aggregation.

Host-side (numpy, loader-time): :func:`partition_graph` builds per-chip
CSR shards and halo index tables with static (padded) shapes.

Device-side (inside shard_map): two SpMM strategies —
- ``halo_spmm``      — all_to_all of exactly the needed boundary rows
                       (padded per device pair), then one local
                       gather/segment-sum.  Traffic ~ cut size.
- ``allgather_spmm`` — all_gather the full node-feature shard ring;
                       simplest, bandwidth ~ N*F, the fallback when the
                       cut is dense.

Both are differentiable end-to-end (XLA derives the collective
transposes), so the full train step runs under one jit.
"""

from dataclasses import dataclass, field
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.ops.segment import segment_sum


def _cdiv(a, b):
    return -(-a // b)


@dataclass(frozen=True)
class GraphShards:
    """Static edge partition over P devices (all arrays stacked on a
    leading P axis, ready to feed shard_map with P('graph') specs).

    nodes_per_shard: rows each device owns (padded; node g lives on
      device g // nodes_per_shard at local row g % nodes_per_shard).
    senders_owner/senders_slot: per local edge, the owner device of its
      source node and the slot of that node in the halo recv buffer.
    halo_send_idx: (P, P, H) local row ids this device must send to each
      peer (padded with 0, masked by halo_send_mask).
    """

    num_devices: int
    nodes_per_shard: int
    edges_per_shard: int
    halo_size: int
    # all numpy, shape leading dim = P
    edge_src_owner: np.ndarray = field(repr=False)   # (P, E) int32
    edge_src_slot: np.ndarray = field(repr=False)    # (P, E) int32
    edge_src_row: np.ndarray = field(repr=False)     # (P, E) int32 (owner-local row)
    edge_dst_local: np.ndarray = field(repr=False)   # (P, E) int32
    edge_mask: np.ndarray = field(repr=False)        # (P, E) bool
    halo_send_idx: np.ndarray = field(repr=False)    # (P, P, H) int32
    halo_send_mask: np.ndarray = field(repr=False)   # (P, P, H) bool

    def device_arrays(self):
        return dict(
            edge_src_owner=jnp.asarray(self.edge_src_owner),
            edge_src_slot=jnp.asarray(self.edge_src_slot),
            edge_src_row=jnp.asarray(self.edge_src_row),
            edge_dst_local=jnp.asarray(self.edge_dst_local),
            edge_mask=jnp.asarray(self.edge_mask),
            halo_send_idx=jnp.asarray(self.halo_send_idx),
            halo_send_mask=jnp.asarray(self.halo_send_mask),
        )

    def shard_nodes(self, x: np.ndarray) -> np.ndarray:
        """(N, F) -> (P, nodes_per_shard, F) with zero padding."""
        P, S = self.num_devices, self.nodes_per_shard
        out = np.zeros((P * S,) + x.shape[1:], dtype=x.dtype)
        out[: x.shape[0]] = x
        return out.reshape((P, S) + x.shape[1:])

    def unshard_nodes(self, x, num_nodes: int):
        flat = np.asarray(x).reshape((-1,) + np.asarray(x).shape[2:])
        return flat[:num_nodes]


def partition_graph(senders, receivers, num_nodes: int, num_devices: int,
                    edge_weights=None) -> Tuple[GraphShards, np.ndarray]:
    """Contiguous node blocks; edges assigned to the receiver's owner.

    Returns (shards, weights_stacked (P, E) float32 — caller's edge
    weights routed to their shard slots, zeros on padding).
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    w = np.ones(senders.shape[0], np.float32) if edge_weights is None \
        else np.asarray(edge_weights, np.float32)
    P = num_devices
    S = _cdiv(num_nodes, P)

    owner = receivers // S
    # per-device edge lists
    per_dev_edges: List[np.ndarray] = [
        np.flatnonzero(owner == p) for p in range(P)]
    E = max((len(e) for e in per_dev_edges), default=1)
    E = max(E, 1)

    # halo: for each (src_owner q -> dst p): unique source nodes
    halo_lists = [[None] * P for _ in range(P)]
    H = 1
    for p in range(P):
        eids = per_dev_edges[p]
        src = senders[eids]
        for q in range(P):
            uniq = np.unique(src[src // S == q])
            halo_lists[q][p] = uniq  # q sends these to p
            H = max(H, len(uniq))

    edge_src_owner = np.zeros((P, E), np.int32)
    edge_src_slot = np.zeros((P, E), np.int32)
    edge_src_row = np.zeros((P, E), np.int32)
    edge_dst_local = np.zeros((P, E), np.int32)
    edge_mask = np.zeros((P, E), bool)
    weights = np.zeros((P, E), np.float32)
    halo_send_idx = np.zeros((P, P, H), np.int32)
    halo_send_mask = np.zeros((P, P, H), bool)

    for q in range(P):
        for p in range(P):
            uniq = halo_lists[q][p]
            halo_send_idx[q, p, : len(uniq)] = (uniq % S).astype(np.int32)
            halo_send_mask[q, p, : len(uniq)] = True

    for p in range(P):
        eids = per_dev_edges[p]
        n = len(eids)
        src = senders[eids]
        q_of = (src // S).astype(np.int32)
        edge_src_owner[p, :n] = q_of
        # slot of src within halo_lists[q][p]
        slots = np.empty(n, np.int32)
        for q in range(P):
            m = q_of == q
            if m.any():
                slots[m] = np.searchsorted(
                    halo_lists[q][p], src[m]).astype(np.int32)
        edge_src_slot[p, :n] = slots
        edge_src_row[p, :n] = (src % S).astype(np.int32)
        edge_dst_local[p, :n] = (receivers[eids] % S).astype(np.int32)
        edge_mask[p, :n] = True
        weights[p, :n] = w[eids]

    shards = GraphShards(
        num_devices=P, nodes_per_shard=S, edges_per_shard=E, halo_size=H,
        edge_src_owner=edge_src_owner, edge_src_slot=edge_src_slot,
        edge_src_row=edge_src_row,
        edge_dst_local=edge_dst_local, edge_mask=edge_mask,
        halo_send_idx=halo_send_idx, halo_send_mask=halo_send_mask)
    return shards, weights


# --- device-side (call inside shard_map over axis `axis`) -----------------

def halo_spmm(x_local, weights, tables, axis: str, halo_size: int,
              num_peers: int):
    """out_local[r] = sum_e w_e * x[src_e] with remote sources fetched by
    all_to_all of exactly the halo rows.

    x_local: (S, F) this device's rows (leading P axis already split by
    shard_map, i.e. arrays here carry no device axis).
    tables: dict of this device's rows of the shard tables (see
    GraphShards.device_arrays, each arriving as (1, ...) slices).
    """
    S, F = x_local.shape
    send_idx = tables["halo_send_idx"]      # (P, H) rows to send to peer
    send_mask = tables["halo_send_mask"]
    send_buf = jnp.take(x_local, send_idx.reshape(-1), axis=0)
    send_buf = send_buf.reshape(num_peers, halo_size, F)
    send_buf = send_buf * send_mask[..., None].astype(send_buf.dtype)
    # all_to_all: slot p of my send buffer reaches device p; I receive
    # each peer q's buffer-for-me at slot q.
    recv = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                              concat_axis=0, tiled=False)
    # recv: (P, H, F) — rows from owner q at [q, slot]
    flat = recv.reshape(num_peers * halo_size, F)
    src = tables["edge_src_owner"] * halo_size + tables["edge_src_slot"]
    msgs = jnp.take(flat, src, axis=0) * weights[:, None]
    return segment_sum(msgs, tables["edge_dst_local"], S)


def allgather_spmm(x_local, weights, tables, axis: str):
    """Fallback: all_gather the full feature matrix then local SpMM."""
    S, F = x_local.shape
    x_full = jax.lax.all_gather(x_local, axis)        # (P, S, F)
    flat = x_full.reshape(-1, F)
    src = tables["edge_src_owner"] * S + tables["edge_src_row"]
    msgs = jnp.take(flat, src, axis=0) * weights[:, None]
    return segment_sum(msgs, tables["edge_dst_local"], S)
