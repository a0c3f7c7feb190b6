"""Block-sparse-row SpMM: dense MXU blocks + packed sparse remainder.

Reference counterpart: torch-sparse ``spmm`` (reference
requirement.txt:2) — the aggregation under every conv at web scale
(Reddit usage: reference ConvexPruning.py:504-507).

The TPU-native observation: after locality ordering, a community-
structured graph concentrates most edges in a few (window, window)
blocks whose density makes *dense* arithmetic cheaper than any
per-edge format.  A 1024x1024 block at Reddit-like intra-community
density (~40%) holds ~400k edges; one bf16 batched-matmul step
(W_b @ x_window, 134M MAC ~ 0.7 us on the MXU) aggregates all of them
— ~0.002 ns/edge of MXU time vs ~4 ns/edge for the one-hot packed
kernel and ~20 ns/edge for XLA's row gather.  Per-edge formats only
remain for the low-density remainder.

Split rule: block pairs with >= ``dense_threshold`` edges become dense
bf16 (window, window) weight blocks consumed by a batched einsum
(gather x windows -> batched matmul -> segment-sum over destination
windows — all XLA, fully autodiff'd, full MXU rate).  The remainder
goes through the packed one-hot kernel (ops/spmm.py) with its
explicit-args static-weight path.

Everything rides the ``bind_external`` convention: the caller passes
the returned ``consts`` pytree through ``jit`` as ARGUMENTS, so
multi-GB tables are device references, never constants serialized into
the compiled program (the remote compiler rejects >600 MB bodies).

Scale note (100M+ edges): the expensive host work — the (src window,
dst window) bucket sort, the dense/sparse split, and the sparse-
remainder packing — depends only on the GRAPH, not on the edge
weights.  :class:`BlockStructure` owns that work so several weightings
(GCN symmetric norm, mean aggregation, ...) share one pass; binding a
new weight vector costs one segment-reduce over the pre-sorted dense
edges plus the sparse bind.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.ops.spmm import SpmmOperator


def _cdiv(a, b):
    return -(-a // b)


def _f32_to_bf16(a: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even float32 -> bfloat16 via integer views.

    ~30x faster than ml_dtypes' element converter on multi-GB block
    tables; the result transfers to device with no further conversion.
    """
    import ml_dtypes
    u = np.ascontiguousarray(a, dtype=np.float32).view(np.uint32)
    rounded = u + (0x7FFF + ((u >> 16) & 1))
    return (rounded >> 16).astype(np.uint16).view(ml_dtypes.bfloat16)


class BlockStructure:
    """Weight-independent packing for :class:`BlockSpmm`.

    Computes once per graph: the (dst window, src window) bucket key
    sort, the dense-block split, the flattened in-block coordinates of
    every dense edge (pre-sorted, ready for a segment-sum per weight
    vector), and the packed sparse-remainder operator.
    """

    def __init__(self, senders, receivers, num_nodes, *,
                 window: int = 1024, dense_threshold: int = 1024,
                 sparse_tile: int = None, compute_dtype=jnp.bfloat16,
                 sparse_window_src: int = None):
        """``sparse_tile=None`` auto-selects from the remainder's mean
        bucket occupancy: scattered graphs whose (src, dst)-window
        buckets hold well under one 256-edge tile pay up to ~5.5x pad
        inflation there; tile=128 halves the padding AND the per-tile
        build/dot cost (measured on the 8M-edge adversarial graph:
        8.76 -> 6.18 ns/edge, 0.77 of the random-access ceiling —
        round 5, VERDICT item 1).

        ``sparse_window_src``: asymmetric remainder windows — a WIDER
        source window for the packed sparse path (dst stays at
        ``window``), merging scattered sub-tile buckets without
        growing the kernel's out-block accumulation."""
        senders = np.asarray(senders, dtype=np.int64)
        receivers = np.asarray(receivers, dtype=np.int64)
        E = senders.shape[0]
        N = int(num_nodes)
        self.num_nodes = N
        self.window = window
        self.compute_dtype = compute_dtype
        nw = max(_cdiv(N, window), 1)
        self.num_windows = nw

        # O(E) structure detection: keys live in the tiny nw*nw space,
        # so a bincount replaces the former np.unique SORT of E keys
        # (round-5: 8M-edge detection ~1 s instead of ~10 s); int32
        # arithmetic halves the numpy pass traffic (N < 2^31 here)
        s32 = senders.astype(np.int32, copy=False)
        r32 = receivers.astype(np.int32, copy=False)
        key = (r32 // window) * np.int32(nw) + (s32 // window)
        counts = np.bincount(key, minlength=nw * nw) if E else \
            np.zeros(nw * nw, np.int64)
        dense_keys = np.flatnonzero(counts >= dense_threshold) if E \
            else np.zeros(0, np.int64)
        dense_mask = (counts >= dense_threshold)[key] if E else \
            np.zeros(0, bool)
        self.dense_edge_frac = float(dense_mask.mean()) if E else 0.0
        B = len(dense_keys)
        self.num_dense_blocks = B

        self._dense_slots = None
        if B:
            ei = np.flatnonzero(dense_mask)
            b_of = np.searchsorted(dense_keys, key[ei])
            # flat in-table slot per dense edge; duplicates sum in the
            # device build's f32 accumulator (multigraph semantics) —
            # no host sort, no host table (round-5: the former 4.8 GB
            # f32 host table + bf16 convert cost ~119 s of page faults
            # at 8M edges)
            self._dense_flat = ((b_of.astype(np.int64) * window
                                 + r32[ei] % window)
                                * window + s32[ei] % window)
            self._dense_edge_ids = ei
            self.block_src_win = jnp.asarray(
                (dense_keys % nw).astype(np.int32))
            self.block_dst_win = jnp.asarray(
                (dense_keys // nw).astype(np.int32))

        sparse_idx = np.flatnonzero(~dense_mask)
        self.sparse_edges = len(sparse_idx)
        self._sparse_edge_ids = sparse_idx
        self.sparse = None
        n_sparse_buckets = int(
            ((counts > 0) & (counts < dense_threshold)).sum())
        mean_occ = self.sparse_edges / max(n_sparse_buckets, 1)
        scattered = mean_occ <= 96
        if sparse_tile is None:
            sparse_tile = 128 if scattered else 256
        if sparse_window_src is None and scattered and N > 4 * window:
            # scattered regime: a 4x-wide SOURCE window merges ~4
            # sub-tile buckets per tile while the dst window (and the
            # out-block accumulation) stays at ``window`` — measured
            # 7.11 -> 5.25 ns/edge on the 8M-edge adversarial graph
            # (~0.87 of the random-access ceiling; 8x-wide regresses)
            sparse_window_src = 4 * window
        self.sparse_tile = sparse_tile
        if len(sparse_idx):
            sw = window if sparse_window_src is None \
                else int(sparse_window_src)
            self.sparse = SpmmOperator(
                senders[sparse_idx], receivers[sparse_idx], N,
                window=sw, tile=sparse_tile,
                compute_dtype=compute_dtype, light=True,
                window_dst=None if sw == window else window)

    @property
    def flop_inflation(self) -> float:
        return (self.sparse.fwd.flop_inflation if self.sparse else 1.0)

    def dense_blocks(self, weights) -> jnp.ndarray:
        """(B, window, window) device block table for one weight vector.

        Built ON DEVICE as a bipartite identity-SpMM: the scatter
        ``table[b*W + r_local, s_local] += w`` is exactly
        ``A_bi @ I_W`` for the bipartite edge set
        (s_local -> b*W + r_local), so it rides the packed one-hot MXU
        kernel (ops/spmm.py) instead of an XLA scatter (measured 52 s
        for 5.5M scalar updates — TPU scatter serializes) or a host
        table build (~12 GB of page-fault traffic + a multi-GB H2D
        upload, measured ~119 s round 4).  The host ships only the
        packed index tables (~tens of MB); duplicates sum in the
        kernel's f32 accumulator (multigraph semantics).  Round-5,
        VERDICT item 2."""
        from pytorch_geometric_tpu.ops.spmm import (
            _bi_apply,
            pack_bipartite_tables,
        )

        W, B = self.window, self.num_dense_blocks
        weights = np.asarray(weights, dtype=np.float32)
        w_dense = weights[self._dense_edge_ids]
        s_local = (self._dense_flat % W).astype(np.int64)
        dst_rows = self._dense_flat // W
        blk_of = (dst_rows // W).astype(np.int64)
        out_dtype = self.compute_dtype
        eye = jnp.asarray(np.eye(W, dtype=np.float32))

        # scalar-prefetch (per-tile) arrays live in 1 MB SMEM, capping
        # a single pallas call at ~80k tiles; chunk the build at BLOCK
        # boundaries (tiles never span blocks) so each chunk is an
        # independent sub-table (measured: the full Reddit dense set is
        # ~101k tiles and OOMs SMEM unchunked)
        tile = 1024
        max_tiles = 40_000
        edges_per_block = np.bincount(blk_of, minlength=B)
        tiles_per_block = -(-edges_per_block // tile) + 1
        cuts = [0]
        acc = 0
        for b in range(B):
            acc += int(tiles_per_block[b])
            if acc > max_tiles:
                cuts.append(b)
                acc = int(tiles_per_block[b])
        cuts.append(B)

        # uniform chunk shapes -> ONE compiled build program reused
        # across chunks (remote compiles cost 1-3 min each)
        nb_u = max(cuts[i + 1] - cuts[i] for i in range(len(cuts) - 1))
        packed = []
        for ci in range(len(cuts) - 1):
            b0, b1 = cuts[ci], cuts[ci + 1]
            # boolean range select per chunk (few chunks): cheaper than
            # a full argsort of the dense edge list at 100M+ edges
            sel = np.flatnonzero((blk_of >= b0) & (blk_of < b1)) \
                if len(cuts) > 2 else slice(None)
            geom, consts = pack_bipartite_tables(
                s_local[sel], dst_rows[sel] - b0 * W, W, nb_u * W,
                w_dense[sel], window=W, tile=tile,
                compute_dtype=self.compute_dtype, directions=("fwd",))
            packed.append((geom, consts, b1 - b0))
        t_max = max(c["fwd"]["tile_src_win"].shape[0]
                    for _, c, _ in packed)
        t_max8 = -(-t_max // 8) * 8

        def pad_fwd(c):
            t = c["fwd"]
            T0 = t["tile_src_win"].shape[0]
            rows = -(-T0 // 8) * 8
            out = {}
            for k in ("local_src", "local_dst", "w"):
                a = t[k]
                out[k] = np.concatenate(
                    [a, np.zeros((t_max8 - a.shape[0],) + a.shape[1:],
                                 a.dtype)]) if a.shape[0] < t_max8 \
                    else a
            # padding tiles repeat the last real dst window with
            # weight 0: the accumulate run stays consecutive and adds
            # zeros to an already-initialised block
            out["tile_src_win"] = np.concatenate(
                [t["tile_src_win"],
                 np.full(t_max8 - T0, t["tile_src_win"][-1],
                         t["tile_src_win"].dtype)])
            out["tile_dst_win"] = np.concatenate(
                [t["tile_dst_win"],
                 np.full(t_max8 - T0, t["tile_dst_win"][-1],
                         t["tile_dst_win"].dtype)])
            out["tile_first"] = np.concatenate(
                [t["tile_first"],
                 np.zeros(t_max8 - T0, t["tile_first"].dtype)])
            del rows
            return {"fwd": out}

        geom0 = packed[0][0]

        @jax.jit
        def run(consts, eye):
            t = _bi_apply(geom0, consts["fwd"], eye, fwd=True)
            return t.reshape(nb_u, W, W).astype(out_dtype)

        chunks = []
        for geom, consts, nb in packed:
            out = run(jax.tree_util.tree_map(
                jnp.asarray, pad_fwd(consts)), eye)
            chunks.append(out if nb == nb_u else out[:nb])
        return chunks[0] if len(chunks) == 1 else \
            jnp.concatenate(chunks, axis=0)


class BlockSpmm:
    """out[r] = sum_e w_e x[s_e] with static weights, at 100M-edge scale.

    Usage::

        op = BlockSpmm(senders, receivers, num_nodes, weights)
        fn, consts = op.bind()
        # inside jit, with consts passed as an argument:
        out = fn(consts, x)            # differentiable in x

    Pass ``structure=`` (a :class:`BlockStructure` built on the same
    graph) to reuse the packing across weightings — the construction
    then costs one segment-reduce instead of a 100M-edge sort.
    """

    def __init__(self, senders, receivers, num_nodes, weights, *,
                 window: int = 1024, dense_threshold: int = 1024,
                 sparse_tile: int = None, compute_dtype=jnp.bfloat16,
                 structure: BlockStructure = None,
                 sparse_window_src: int = None):
        if structure is None:
            structure = BlockStructure(
                senders, receivers, num_nodes, window=window,
                dense_threshold=dense_threshold,
                sparse_tile=sparse_tile, compute_dtype=compute_dtype,
                sparse_window_src=sparse_window_src)
        st = structure
        self.structure = st
        self.num_nodes = st.num_nodes
        self.window = st.window
        self.num_windows = st.num_windows
        self.dense_edge_frac = st.dense_edge_frac
        self.num_dense_blocks = st.num_dense_blocks
        self.sparse_edges = st.sparse_edges
        self._sparse = st.sparse
        self._compute = st.compute_dtype

        weights = np.asarray(weights, dtype=np.float32)
        consts: Dict[str, Any] = {}
        if st.num_dense_blocks:
            # already a device array in compute dtype (built on device)
            consts["blocks"] = st.dense_blocks(weights)
            consts["bsw"] = st.block_src_win
            consts["bdw"] = st.block_dst_win
        if st.sparse is not None:
            sp_fn, sp_consts = st.sparse.bind_external(
                weights[st._sparse_edge_ids])
            self._sp_fn = sp_fn
            consts["sparse"] = sp_consts
        self._consts = consts

    @property
    def flop_inflation(self) -> float:
        return self.structure.flop_inflation

    def bind(self) -> Tuple[Any, Dict[str, Any]]:
        """Returns (fn, consts); fn(consts, x) differentiable in x."""
        window, nw, N = self.window, self.num_windows, self.num_nodes
        B = self.num_dense_blocks
        has_sparse = self._sparse is not None
        sp_fn = self._sp_fn if has_sparse else None
        compute = self._compute

        def fn(consts, x):
            F = x.shape[1]
            out = None
            if B:
                x_pad = jnp.zeros((nw * window, F), compute)
                x_pad = x_pad.at[:N].set(x.astype(compute))
                xw = x_pad.reshape(nw, window, F)
                # gather source windows -> batched MXU matmul ->
                # segment-sum over destination windows (XLA autodiffs
                # the whole chain; transposes reuse the same blocks)
                xs = jnp.take(xw, consts["bsw"], axis=0)  # (B, W, F)
                contrib = jnp.einsum(
                    "bij,bjf->bif", consts["blocks"], xs,
                    preferred_element_type=jnp.float32)
                dense = jax.ops.segment_sum(contrib, consts["bdw"],
                                            num_segments=nw)
                out = dense.reshape(nw * window, F)[:N]
            if has_sparse:
                sp = sp_fn(consts["sparse"], x)
                out = sp if out is None else out + sp
            if out is None:
                out = jnp.zeros((N, x.shape[1]), jnp.float32)
            return out

        return fn, self._consts
