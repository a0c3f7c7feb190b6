"""Host-side edge packing for the Pallas SpMM kernel.

TPUs want static shapes and MXU-sized dense tiles.  Instead of translating
the reference's CUDA gather/scatter (torch-scatter / torch-sparse,
reference requirement.txt:1-3), edges are packed *on the host* into
(source-window, destination-window) buckets:

- nodes are split into windows of ``window`` rows (a VMEM-resident tile of
  the feature matrix),
- every edge lands in the bucket of its (src window, dst window) pair,
- buckets are padded to a multiple of ``tile`` edges and laid out sorted
  by destination window (so the kernel's output-block revisits are
  consecutive, enabling in-VMEM accumulation).

Inside the kernel, gather and scatter become *one-hot matmuls* on the MXU
(edges x window one-hot @ window x features), which is the TPU-idiomatic
replacement for CUDA's per-edge atomic scatter-add.  Padding edges carry
weight 0 and therefore contribute nothing.

All packing is numpy on host (this is loader-time work, akin to the
reference's DataLoader collation, examples/mutag_gin.py:14-15).
"""

from dataclasses import dataclass, field

import numpy as np


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclass(frozen=True)
class WindowedPack:
    """Static edge packing consumed by ``spmm_pallas``.

    Attributes
    ----------
    window : node-window size (rows of x resident in VMEM per tile).
    tile   : edges processed per grid step.
    num_nodes : logical node count N (output rows).
    num_src_windows / num_dst_windows : cdiv(N, window).
    perm   : (T*tile,) int32 — maps packed edge slot -> original edge id,
             padding slots -> num_edges (an appended zero-weight slot).
    local_src / local_dst : (T, tile) int32 — window-local endpoint indices
             (0 for padding; harmless since weight is 0).
    tile_src_win / tile_dst_win : (T,) int32 — window ids per tile.
    tile_first : (T,) int32 — 1 iff tile is the first of its dst window
             (kernel zero-initialises the output block there).
    """

    window: int
    tile: int
    num_nodes: int
    num_edges: int
    num_src_windows: int
    num_dst_windows: int
    perm: np.ndarray = field(repr=False)
    local_src: np.ndarray = field(repr=False)
    local_dst: np.ndarray = field(repr=False)
    tile_src_win: np.ndarray = field(repr=False)
    tile_dst_win: np.ndarray = field(repr=False)
    tile_first: np.ndarray = field(repr=False)
    #: destination-window size; None = same as ``window`` (asymmetric
    #: windows are the round-5 scattered-tail lever: wide source
    #: windows merge sub-tile buckets, the narrow dst window keeps the
    #: kernel's out-block accumulation small)
    window_dst: int = None

    @property
    def dst_window(self) -> int:
        return self.window if self.window_dst is None \
            else self.window_dst

    @property
    def num_tiles(self) -> int:
        return int(self.tile_src_win.shape[0])

    @property
    def flop_inflation(self) -> float:
        """Padded-edge inflation factor (packed slots / real edges)."""
        return (self.num_tiles * self.tile) / max(self.num_edges, 1)


def pack_windows(senders, receivers, num_nodes, *, window=256, tile=256,
                 native=True, num_dst_nodes=None, window_dst=None):
    """Bucket edges by (src window, dst window); pad buckets to ``tile``.

    Returns a :class:`WindowedPack`.  Empty (window, window) buckets cost
    nothing — only non-empty buckets produce tiles, which is where this
    beats a dense blocked adjacency.

    ``num_dst_nodes`` makes the pack BIPARTITE: senders index a source
    domain of ``num_nodes`` rows, receivers a destination domain of
    ``num_dst_nodes`` rows (the halo-partition remote aggregation,
    parallel/partition.py — recv-buffer rows -> local nodes).  The
    square case is unchanged.

    The hot loop runs in native code when the graphcore library is
    available (cluster/native/graphcore.cpp ``pack_edges_bi``: a stable
    counting sort + linear emit, ~60x the Python bucket loop at 4M
    edges, square AND bipartite since round 5); the numpy path below is
    the reference implementation and the fallback.
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    E = senders.shape[0]
    wd = window if window_dst is None else int(window_dst)
    n_src_w = max(_cdiv(num_nodes, window), 1)
    bipartite = num_dst_nodes is not None
    n_dst_w = max(_cdiv(num_dst_nodes if bipartite else num_nodes,
                        wd), 1)

    if native and E:
        pk = _pack_windows_native(
            senders, receivers, num_nodes,
            num_dst_nodes if bipartite else num_nodes, E,
            n_src_w, n_dst_w, window, wd, tile)
        if pk is not None:
            return pk

    sw = senders // window
    dw = receivers // wd
    # Sort by (dst window, src window) so dst-window revisits are
    # consecutive (Pallas requires monotone output-block visits for
    # accumulation), and src windows within a dst window are grouped
    # (better x-block reuse in the DMA pipeline).
    key = dw * n_src_w + sw
    order = np.argsort(key, kind="stable")
    sw_s, dw_s = sw[order], dw[order]

    # Bucket boundaries over the sorted edge list.
    bucket_key = dw_s * n_src_w + sw_s
    boundaries = np.flatnonzero(np.diff(bucket_key)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [E]])

    perm_chunks, lsrc_chunks, ldst_chunks = [], [], []
    t_sw, t_dw, t_first = [], [], []
    prev_dw = -1
    for s, e in zip(starts, ends):
        if e <= s:
            continue
        cnt = e - s
        padded = _cdiv(cnt, tile) * tile
        idx = np.full(padded, E, dtype=np.int64)
        idx[:cnt] = order[s:e]
        lsrc = np.zeros(padded, dtype=np.int32)
        ldst = np.zeros(padded, dtype=np.int32)
        lsrc[:cnt] = (senders[order[s:e]] % window).astype(np.int32)
        ldst[:cnt] = (receivers[order[s:e]] % wd).astype(np.int32)
        n_tiles_here = padded // tile
        this_dw = int(dw_s[s])
        this_sw = int(sw_s[s])
        for t in range(n_tiles_here):
            t_sw.append(this_sw)
            t_dw.append(this_dw)
            t_first.append(1 if (this_dw != prev_dw and t == 0) else 0)
        prev_dw = this_dw
        perm_chunks.append(idx)
        lsrc_chunks.append(lsrc)
        ldst_chunks.append(ldst)

    if not perm_chunks:  # graph with no edges: one all-padding tile
        perm_chunks = [np.full(tile, E, dtype=np.int64)]
        lsrc_chunks = [np.zeros(tile, dtype=np.int32)]
        ldst_chunks = [np.zeros(tile, dtype=np.int32)]
        t_sw, t_dw, t_first = [0], [0], [1]

    perm = np.concatenate(perm_chunks).astype(np.int32)
    T = perm.shape[0] // tile
    # Every dst window must be visited at least once so the output is
    # fully initialised; emit an all-padding tile for untouched windows.
    seen = set(t_dw)
    extra = [w for w in range(n_dst_w) if w not in seen]
    if extra:
        for w in extra:
            t_sw.append(0)
            t_dw.append(w)
            t_first.append(1)
        perm = np.concatenate(
            [perm, np.full(tile * len(extra), E, dtype=np.int32)])
        lsrc_chunks.append(np.zeros(tile * len(extra), dtype=np.int32))
        ldst_chunks.append(np.zeros(tile * len(extra), dtype=np.int32))
        T = perm.shape[0] // tile

    local_src = np.concatenate(lsrc_chunks).reshape(T, tile)
    local_dst = np.concatenate(ldst_chunks).reshape(T, tile)

    return WindowedPack(
        window=window, tile=tile, num_nodes=int(num_nodes), num_edges=int(E),
        num_src_windows=n_src_w, num_dst_windows=n_dst_w,
        perm=perm, local_src=local_src, local_dst=local_dst,
        tile_src_win=np.asarray(t_sw, dtype=np.int32),
        tile_dst_win=np.asarray(t_dw, dtype=np.int32),
        tile_first=np.asarray(t_first, dtype=np.int32),
        window_dst=None if window_dst is None else wd,
    )


def _pack_windows_native(senders, receivers, num_nodes, num_dst_nodes,
                         E, n_src_w, n_dst_w, window, window_dst,
                         tile):
    """Native pack_edges_asym call; None when the library is
    unavailable."""
    from pytorch_geometric_tpu.cluster._native import (
        as_i64,
        get_lib,
        ptr_i64,
    )

    lib = get_lib()
    if lib is None:
        return None
    s64, r64 = as_i64(senders), as_i64(receivers)
    # count-only pass sizes the outputs exactly (a worst-case
    # allocation costs more in first-touch page faults than the pack)
    T = lib.pack_edges_asym(ptr_i64(s64), ptr_i64(r64), E,
                            int(num_nodes), int(num_dst_nodes),
                            window, window_dst, tile, 0, None, None,
                            None, None, None, None)
    if T <= 0:
        return None
    import ctypes
    p32 = ctypes.POINTER(ctypes.c_int32)

    def ptr_i32(a):
        return a.ctypes.data_as(p32)

    perm = np.empty(T * tile, np.int32)
    lsrc = np.empty(T * tile, np.int32)
    ldst = np.empty(T * tile, np.int32)
    t_sw = np.empty(T, np.int32)
    t_dw = np.empty(T, np.int32)
    t_first = np.empty(T, np.int32)
    T = lib.pack_edges_asym(ptr_i64(s64), ptr_i64(r64), E,
                            int(num_nodes), int(num_dst_nodes),
                            window, window_dst, tile, T,
                            ptr_i32(perm), ptr_i32(lsrc),
                            ptr_i32(ldst), ptr_i32(t_sw),
                            ptr_i32(t_dw), ptr_i32(t_first))
    if T < 0:
        return None
    return WindowedPack(
        window=window, tile=tile, num_nodes=int(num_nodes),
        num_edges=int(E), num_src_windows=n_src_w,
        num_dst_windows=n_dst_w,
        perm=perm,
        local_src=lsrc.reshape(T, tile),
        local_dst=ldst.reshape(T, tile),
        tile_src_win=t_sw,
        tile_dst_win=t_dw,
        tile_first=t_first,
        window_dst=None if window_dst == window else window_dst,
    )
