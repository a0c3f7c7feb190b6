"""Sorted-CSR segment-sum SpMM — the high-throughput TPU path.

Profiling shows XLA's per-edge gather (``jnp.take``) runs near memory
bandwidth on TPU while its scatter-add (``segment_sum``) is the
bottleneck.  This kernel replaces only the scatter side:

- host packing (:func:`pack_sorted`): edges sorted by receiver are cut
  into ``tile``-edge chunks that never cross an ``rows``-aligned output
  block boundary (chunks are split and padded at boundaries), giving
  each tile exactly one output block and consecutive revisits;
- device: XLA gathers source rows *in packed order* (one take, no extra
  permutation pass), multiplies edge weights, and the Pallas kernel
  scatter-accumulates each tile into its output block with a single
  (rows x tile) one-hot matmul on the MXU — ~rows MACs/edge instead of
  a serialized scatter.

Backward: dx = transposed-pack SpMM of the cotangent (same kernel),
dw = per-edge dot of gathered rows (XLA).
"""

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


@dataclass(frozen=True)
class SortedPack:
    tile: int
    rows: int
    num_nodes: int
    num_edges: int
    num_row_blocks: int
    senders_packed: np.ndarray = field(repr=False)   # (T*tile,) int32
    perm: np.ndarray = field(repr=False)             # packed slot -> edge id (E = pad)
    local_dst: np.ndarray = field(repr=False)        # (T8, tile) int32
    tile_block: np.ndarray = field(repr=False)       # (T,) int32
    tile_first: np.ndarray = field(repr=False)       # (T,) int32

    @property
    def num_tiles(self):
        return int(self.tile_block.shape[0])


def pack_sorted(senders, receivers, num_nodes, *, tile=256, rows=256):
    """Pack receiver-sorted edges into boundary-aligned tiles."""
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    order = np.argsort(receivers, kind="stable")
    s = senders[order]
    r = receivers[order]
    E = s.shape[0]
    n_blocks = max(_round_up(num_nodes, rows) // rows, 1)

    block_of = r // rows
    # boundaries where the output block changes
    cuts = np.flatnonzero(np.diff(block_of)) + 1
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [E]])

    perm_chunks, ldst_chunks, t_block, t_first = [], [], [], []
    for st, en in zip(starts, ends):
        cnt = en - st
        padded = _round_up(cnt, tile)
        idx = np.full(padded, E, dtype=np.int32)
        idx[:cnt] = order[st:en]
        ld = np.zeros(padded, dtype=np.int32)
        ld[:cnt] = (r[st:en] % rows).astype(np.int32)
        b = int(block_of[st])
        n_t = padded // tile
        for k in range(n_t):
            t_block.append(b)
            t_first.append(1 if k == 0 else 0)
        perm_chunks.append(idx)
        ldst_chunks.append(ld)

    if not perm_chunks:
        perm_chunks = [np.full(tile, E, np.int32)]
        ldst_chunks = [np.zeros(tile, np.int32)]
        t_block, t_first = [0], [1]

    # blocks never visited must still be zero-initialised
    seen = set(t_block)
    for b in range(n_blocks):
        if b not in seen:
            t_block.append(b)
            t_first.append(1)
            perm_chunks.append(np.full(tile, E, np.int32))
            ldst_chunks.append(np.zeros(tile, np.int32))

    perm = np.concatenate(perm_chunks)
    T = perm.shape[0] // tile
    T8 = _round_up(T, 8)
    local_dst = np.concatenate(ldst_chunks).reshape(T, tile)
    if T8 != T:
        local_dst = np.concatenate(
            [local_dst, np.zeros((T8 - T, tile), np.int32)])
    # perm holds original edge ids; padding slots point at the appended
    # dummy sender 0 (their weight is forced to 0)
    s_ext = np.concatenate([senders, [0]])
    senders_packed = s_ext[np.minimum(perm, E)].astype(np.int32)

    return SortedPack(
        tile=tile, rows=rows, num_nodes=int(num_nodes), num_edges=E,
        num_row_blocks=n_blocks, senders_packed=senders_packed,
        perm=perm,
        local_dst=local_dst,
        tile_block=np.asarray(t_block, np.int32),
        tile_first=np.asarray(t_first, np.int32))


def _scatter_kernel(rows, tile, compute_dtype, out_t, block_ref,
                    first_ref, msgs_ref, ldst_ref, cols_ref, out_ref):
    from pytorch_geometric_tpu.ops.kernel_util import edge_onehot

    t = pl.program_id(1)
    ld = ldst_ref[t % 8, :]
    # (tile, rows) one-hot with the HOISTED column iota (round-2
    # lesson: the in-kernel 32-bit iota costs as much as the compare)
    scat = edge_onehot(ld, cols_ref, tile, rows, dtype=compute_dtype)
    m = msgs_ref[...].astype(compute_dtype)
    if out_t:
        # lane-compact transposed out for narrow F (round-4 lesson:
        # a (rows, F<=64) block pads its minor dim to 128 lanes; the
        # (F8, rows) block is compact) — same contraction, operands
        # swapped, zero extra kernel work
        contrib = jax.lax.dot_general(
            m[:, :out_t], scat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (out_t, rows)
    else:
        contrib = jax.lax.dot_general(
            scat, m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (rows, f_tile)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[...] = contrib

    @pl.when(first_ref[t] == 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _scatter_tiles(msgs_packed, local_dst, tile_block, tile_first, *,
                   rows, tile, n_blocks, f_tile,
                   compute_dtype=jnp.float32, out_rows=None):
    from pytorch_geometric_tpu.ops.kernel_util import iota_rows

    T = tile_block.shape[0]
    fp = msgs_packed.shape[1]
    n_ft = fp // f_tile
    if out_rows is not None:
        assert n_ft == 1 and rows % 128 == 0
        out_specs = pl.BlockSpec(
            (out_rows, rows), lambda j, t, blk, first: (0, blk[t]))
        out_shape = jax.ShapeDtypeStruct(
            (out_rows, n_blocks * rows), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (rows, f_tile), lambda j, t, blk, first: (blk[t], j))
        out_shape = jax.ShapeDtypeStruct((n_blocks * rows, fp),
                                         jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ft, T),
        in_specs=[
            pl.BlockSpec((tile, f_tile), lambda j, t, blk, first: (t, j)),
            pl.BlockSpec((8, tile), lambda j, t, *_: (t // 8, 0)),
            pl.BlockSpec((8, rows), lambda j, t, *_: (0, 0)),
        ],
        out_specs=out_specs,
    )
    kernel = functools.partial(_scatter_kernel, rows, tile,
                               compute_dtype, out_rows)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * tile * rows * fp,
            bytes_accessed=T * tile * (fp * 4 + 4) + n_blocks * rows * fp
            * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(tile_block, tile_first, msgs_packed, local_dst, iota_rows(rows))


class SortedSpmm:
    """out[r] = sum_{e: recv[e]=r} w[e] x[send[e]] over a fixed edge
    structure, differentiable in (weights, x)."""

    def __init__(self, senders, receivers, num_nodes, *, tile=256,
                 rows=256, f_tile=128, compute_dtype=jnp.float32):
        if tile % 128 or rows % 8:
            raise ValueError("tile % 128 == 0 and rows % 8 == 0 required")
        self.f_tile = f_tile
        self.compute_dtype = compute_dtype
        self.num_nodes = int(num_nodes)
        self.fwd = pack_sorted(senders, receivers, num_nodes, tile=tile,
                               rows=rows)
        self.bwd = pack_sorted(receivers, senders, num_nodes, tile=tile,
                               rows=rows)
        self.senders = jnp.asarray(np.asarray(senders), jnp.int32)
        self.receivers = jnp.asarray(np.asarray(receivers), jnp.int32)
        self._dev = {}
        for name, pk in (("fwd", self.fwd), ("bwd", self.bwd)):
            self._dev[name] = dict(
                senders_packed=jnp.asarray(pk.senders_packed),
                perm=jnp.asarray(pk.perm),
                local_dst=jnp.asarray(pk.local_dst),
                tile_block=jnp.asarray(pk.tile_block),
                tile_first=jnp.asarray(pk.tile_first),
            )

    def _run(self, which, weights, x):
        pk = self.fwd if which == "fwd" else self.bwd
        dv = self._dev[which]
        N, F = self.num_nodes, x.shape[1]
        fp = _round_up(F, self.f_tile)
        if fp != F:
            x = jnp.pad(x, ((0, 0), (0, fp - F)))
        w_ext = jnp.concatenate(
            [weights.astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
        w_packed = jnp.take(w_ext, jnp.minimum(dv["perm"], pk.num_edges))
        w_packed = jnp.where(dv["perm"] == pk.num_edges, 0.0, w_packed)
        # bf16 messages halve the per-tile DMA when the caller opted
        # into bf16 compute (the MXU consumes bf16 anyway; the one-hot
        # accumulation stays f32)
        mdt = jnp.bfloat16 if self.compute_dtype == jnp.bfloat16 \
            else jnp.float32
        msgs = (jnp.take(x, dv["senders_packed"], axis=0)
                * w_packed[:, None]).astype(mdt)
        # lane-compact transposed out for narrow F (round-4 lesson)
        out_rows = _round_up(F, 8) if (
            F <= 64 and pk.rows % 128 == 0 and fp == self.f_tile) \
            else None
        out = _scatter_tiles(
            msgs, dv["local_dst"], dv["tile_block"],
            dv["tile_first"], rows=pk.rows, tile=pk.tile,
            n_blocks=pk.num_row_blocks, f_tile=self.f_tile,
            compute_dtype=self.compute_dtype, out_rows=out_rows)
        if out_rows is not None:
            return out[:F, :N].T
        return out[:N, :F]

    def __call__(self, weights, x):
        return _sorted_apply(self, weights, x)


class SortedSegmentSum:
    """Segment-sum of *precomputed* per-edge messages via the blocked
    scatter-matmul kernel: out[r] = sum_{e: recv[e]=r} msgs[e].

    For attention-style convs (GAT) where messages are built on device
    (alpha * h_j) and only the scatter remains; replaces XLA's slow
    scatter-add with one MXU matmul per tile.  Differentiable: the VJP
    of a segment-sum is a gather of the cotangent at the receivers.
    """

    def __init__(self, receivers, num_nodes, *, tile=256, rows=256,
                 f_tile=128, compute_dtype=jnp.float32):
        receivers = np.asarray(receivers)
        senders_dummy = np.zeros_like(receivers)
        self.f_tile = f_tile
        self.compute_dtype = compute_dtype
        self.num_nodes = int(num_nodes)
        self.pk = pack_sorted(senders_dummy, receivers, num_nodes,
                              tile=tile, rows=rows)
        self.receivers = jnp.asarray(receivers, jnp.int32)
        self._perm = jnp.asarray(self.pk.perm)
        self._local_dst = jnp.asarray(self.pk.local_dst)
        self._tile_block = jnp.asarray(self.pk.tile_block)
        self._tile_first = jnp.asarray(self.pk.tile_first)

    def __call__(self, msgs):
        return _seg_sum_apply(self, msgs)

    def _run(self, msgs):
        pk = self.pk
        E, F = msgs.shape
        fp = _round_up(F, self.f_tile)
        if fp != F:
            msgs = jnp.pad(msgs, ((0, 0), (0, fp - F)))
        m_ext = jnp.concatenate(
            [msgs.astype(jnp.float32), jnp.zeros((1, fp), jnp.float32)])
        packed = jnp.take(m_ext, jnp.minimum(self._perm, E), axis=0)
        packed = jnp.where((self._perm == E)[:, None], 0.0, packed)
        out = _scatter_tiles(packed, self._local_dst, self._tile_block,
                             self._tile_first, rows=pk.rows, tile=pk.tile,
                             n_blocks=pk.num_row_blocks,
                             f_tile=self.f_tile,
                             compute_dtype=self.compute_dtype)
        return out[: self.num_nodes, :F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _seg_sum_apply(op, msgs):
    return op._run(msgs)


def _seg_sum_fwd(op, msgs):
    return op._run(msgs), None


def _seg_sum_bwd(op, _, g):
    return (jnp.take(g, op.receivers, axis=0),)


_seg_sum_apply.defvjp(_seg_sum_fwd, _seg_sum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sorted_apply(op, weights, x):
    return op._run("fwd", weights, x)


def _sorted_fwd(op, weights, x):
    return op._run("fwd", weights, x), (weights, x)


def _sorted_bwd(op, res, g):
    weights, x = res
    dx = op._run("bwd", weights, g.astype(jnp.float32)).astype(x.dtype)
    dw = jnp.sum(jnp.take(g, op.receivers, axis=0)
                 * jnp.take(x, op.senders, axis=0), axis=-1)
    return dw.astype(weights.dtype), dx


_sorted_apply.defvjp(_sorted_fwd, _sorted_bwd)
