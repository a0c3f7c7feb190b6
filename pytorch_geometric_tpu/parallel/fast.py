"""Fast-kernel halo SpMM: the distributed path on the single-chip ops.

Round-3 verdict: the halo aggregation ran generic XLA ``jnp.take`` +
``segment_sum`` (~20 ns/row) — 113x under the single-chip BSR/packed
kernels, making 8-way scaling pointless.  This module routes BOTH parts
of the partitioned aggregation through the fast kernels:

- **local edges** (per shard, S x S): the BlockSpmm split — dense
  (window, window) bf16 blocks as batched MXU matmuls + the packed
  one-hot Pallas kernel for the sparse remainder (ops/block_spmm.py
  rationale);
- **remote edges** (recv-buffer rows -> S local rows): the bipartite
  packed kernel (ops/spmm.py ``spmm_bi_static``).

SPMD constraint: inside ``shard_map`` every device runs ONE program, so
per-device static tables are stacked on a leading P axis and passed as
sharded *arguments* (device references, never program constants), with
shapes unified across devices: dense-block counts pad with zero blocks,
sparse packs pad with no-op tiles (``ops.spmm.pad_bi_tables``).

Reference counterpart: none — the reference's only parallelism is
single-process DataParallel (ConvexPruning.py:530); this is the
TPU-native scale-out analog (SURVEY §2d edge-partition mapping).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.ops.spmm import (
    BiSpmmGeom,
    pack_bipartite_tables,
    pad_bi_tables,
    spmm_bi_static,
)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


class PartitionedSpmm:
    """out[r] = sum_e w_e x[src_e] across an edge partition, fast path.

    Host build (loader-time)::

        op = PartitionedSpmm(shards, w_local, w_remote)
        consts = op.device_consts()        # pytree of (P, ...) arrays

    Device use (inside shard_map, with ``consts`` sharded on axis 0)::

        out = op.apply(consts_slice, x_local, axis="graph")

    Differentiable in ``x_local`` end-to-end (XLA derives the
    all_to_all transpose; the packed kernels carry custom VJPs).
    """

    def __init__(self, shards, w_local, w_remote, *, window: int = 1024,
                 sparse_tile: int = None, dense_threshold: int = 1024,
                 compute_dtype=jnp.bfloat16):
        """``sparse_tile=None``: occupancy-adaptive like
        ``BlockStructure`` — tile=128 when the local remainder's mean
        bucket occupancy is in the scattered (sub-96-edge) regime, so
        the halo path keeps pace with the single-chip kernels it is
        anchored against (round 5)."""
        P = shards.num_devices
        S = shards.nodes_per_shard
        H = shards.halo_size
        R = P * H
        self.shards = shards
        self.num_peers = P
        self.halo_size = H
        self.window = window
        self.compute_dtype = compute_dtype
        nw = max(_cdiv(S, window), 1)
        self.num_windows = nw

        if sparse_tile is None:
            # global occupancy estimate over all shards' local edges
            occ_edges = occ_buckets = 0
            for p in range(P):
                lm = shards.loc_mask[p]
                if not lm.any():
                    continue
                key_p = ((shards.loc_dst[p][lm].astype(np.int64)
                          // window) * nw
                         + shards.loc_src_row[p][lm] // window)
                cnt = np.bincount(key_p, minlength=nw * nw)
                sp = (cnt > 0) & (cnt < dense_threshold)
                occ_buckets += int(sp.sum())
                occ_edges += int(cnt[sp].sum())
            mean_occ = occ_edges / max(occ_buckets, 1)
            sparse_tile = 128 if mean_occ <= 96 else 256
            # scattered regime: 4x-wide SOURCE windows for the local
            # sparse pack (merges sub-tile buckets; dst/out-block
            # stays at ``window`` — the BlockStructure lever)
            self._lsp_window_src = 4 * window if (
                mean_occ <= 96 and S > 4 * window) else window
        else:
            self._lsp_window_src = window
        self.sparse_tile = sparse_tile

        w_local = np.asarray(w_local, np.float32)
        w_remote = np.asarray(w_remote, np.float32)

        # ---- per-device split + pack (host, numpy) ----
        dense_per_dev = []          # (blocks, bsw, bdw)
        lsp_per_dev = []            # local sparse consts
        rsp_per_dev = []            # remote consts
        lsp_geom = rsp_geom = None
        total_dense = 0
        total_edges = 0
        for p in range(P):
            lm = shards.loc_mask[p]
            ls = shards.loc_src_row[p][lm].astype(np.int64)
            ld = shards.loc_dst[p][lm].astype(np.int64)
            lw = w_local[p][lm]
            total_edges += len(ls) + int(shards.rem_mask[p].sum())

            # dense/sparse split on the local edges (BlockSpmm rule)
            if len(ls):
                key = (ld // window) * nw + (ls // window)
                uniq, inv, counts = np.unique(
                    key, return_inverse=True, return_counts=True)
                dm = counts[inv] >= dense_threshold
            else:
                uniq = np.zeros(0, np.int64)
                counts = np.zeros(0, np.int64)
                dm = np.zeros(0, bool)
            dkeys = uniq[counts >= dense_threshold]
            B = len(dkeys)
            total_dense += int(dm.sum())
            if B:
                ei = np.flatnonzero(dm)
                b_of = np.searchsorted(dkeys, key[ei])
                flat = ((b_of * window + ld[ei] % window) * window
                        + ls[ei] % window)
                blocks = np.zeros(B * window * window, np.float32)
                np.add.at(blocks, flat, lw[ei])
                blocks = blocks.reshape(B, window, window)
                bsw = (dkeys % nw).astype(np.int32)
                bdw = (dkeys // nw).astype(np.int32)
            else:
                blocks = np.zeros((0, window, window), np.float32)
                bsw = bdw = np.zeros(0, np.int32)
            dense_per_dev.append((blocks, bsw, bdw))

            sw_wide = self._lsp_window_src
            geom, lsp = pack_bipartite_tables(
                ls[~dm], ld[~dm], S, S, lw[~dm], window=sw_wide,
                tile=sparse_tile, compute_dtype=compute_dtype,
                window_dst=None if sw_wide == window else window)
            lsp_geom = geom
            lsp_per_dev.append(lsp)

            rm = shards.rem_mask[p]
            rs = (shards.rem_owner[p][rm].astype(np.int64) * H
                  + shards.rem_slot[p][rm])
            rd = shards.rem_dst[p][rm].astype(np.int64)
            geom, rsp = pack_bipartite_tables(
                rs, rd, R, S, w_remote[p][rm], window=window,
                tile=sparse_tile, compute_dtype=compute_dtype)
            rsp_geom = geom
            rsp_per_dev.append(rsp)

        self.dense_edge_frac = total_dense / max(total_edges, 1)

        # ---- unify shapes across devices and stack ----
        Bmax = max(b.shape[0] for b, _, _ in dense_per_dev)
        self.num_dense_blocks = Bmax
        self._lsp_geom: BiSpmmGeom = lsp_geom
        self._rsp_geom: BiSpmmGeom = rsp_geom

        def tmax(per_dev, which):
            return max(t[which]["tile_src_win"].shape[0]
                       for t in per_dev)

        stacked = {}
        if Bmax:
            blk = np.zeros((P, Bmax, window, window), np.float32)
            bsw = np.zeros((P, Bmax), np.int32)
            bdw = np.zeros((P, Bmax), np.int32)
            for p, (b, s, d) in enumerate(dense_per_dev):
                blk[p, : b.shape[0]] = b
                bsw[p, : b.shape[0]] = s
                bdw[p, : b.shape[0]] = d
            if compute_dtype == jnp.bfloat16:
                from pytorch_geometric_tpu.ops.block_spmm import (
                    _f32_to_bf16)
                blk = _f32_to_bf16(blk)
            stacked["blocks"] = blk
            stacked["bsw"] = bsw
            stacked["bdw"] = bdw
        for name, per_dev in (("lsp", lsp_per_dev), ("rsp", rsp_per_dev)):
            Tf = tmax(per_dev, "fwd")
            Tb = tmax(per_dev, "bwd")
            padded = [pad_bi_tables(t, Tf, Tb) for t in per_dev]
            stacked[name] = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *padded)
        self._consts_np = stacked

    def device_consts(self):
        """The stacked (P, ...) tables as device arrays — pass through
        jit as ARGUMENTS sharded P('graph') on the leading axis."""
        return jax.tree_util.tree_map(jnp.asarray, self._consts_np)

    # ---- device side (call inside shard_map) ----

    def apply(self, consts, x_local, axis: str):
        """Fast halo SpMM for one device's shard.  ``consts`` is this
        device's slice (leading P axis consumed by shard_map specs)."""
        S, F = x_local.shape
        # halo exchange first so the collective overlaps the local work.
        # Rows cross the ICI in compute_dtype (bf16 by default): the
        # consuming kernels cast every operand to compute_dtype anyway,
        # so the fwd halo values are bit-identical while the exchange
        # moves HALF the bytes (and the backward all_to_all transpose
        # carries the cotangent at the same width — matching the bf16
        # MXU precision the kernels' VJPs use internally)
        send_buf = jnp.take(
            x_local, consts["halo_send_idx"].reshape(-1),
            axis=0).astype(self.compute_dtype).reshape(
                self.num_peers, self.halo_size, F)
        recv = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                                  concat_axis=0, tiled=False)

        out = spmm_bi_static(self._lsp_geom, consts["lsp"], x_local)
        if self.num_dense_blocks:
            window, nw = self.window, self.num_windows
            x_pad = jnp.zeros((nw * window, F), self.compute_dtype)
            x_pad = x_pad.at[:S].set(x_local.astype(self.compute_dtype))
            xw = x_pad.reshape(nw, window, F)
            xs = jnp.take(xw, consts["bsw"], axis=0)
            contrib = jnp.einsum("bij,bjf->bif", consts["blocks"], xs,
                                 preferred_element_type=jnp.float32)
            dense = jax.ops.segment_sum(contrib, consts["bdw"],
                                        num_segments=nw)
            out = out + dense.reshape(nw * window, F)[:S]

        flat = recv.reshape(self.num_peers * self.halo_size, F)
        out = out + spmm_bi_static(self._rsp_geom, consts["rsp"], flat)
        return out

    def bind(self) -> Tuple:
        """(apply_fn, consts): ``apply_fn(consts_slice, x_local, axis)``
        inside shard_map; consts sharded on the leading axis."""
        consts = self.device_consts()
        consts["halo_send_idx"] = jnp.asarray(
            np.stack([self.shards.halo_send_idx[p].reshape(-1)
                      for p in range(self.shards.num_devices)])
            .astype(np.int32))
        return self.apply, consts
