"""Packed-edge fused GAT attention (Pallas, TPU) — whole layer, O(E) work.

Reference semantics: ``torch_geometric.nn.GATConv`` of PyG 1.4.x
(reference examples/gat.py:22-28), numerically equal to the sparse
segment-softmax path in nn/conv/gat_conv.py.

The third GAT backend, for graphs whose adjacency blocks are mostly
empty inside (PubMed: 0.05% intra-block density makes the block-sparse
operator burn ~2000x the VPU work of the edge count):

- edges are packed host-side into (src-window, dst-window) buckets
  (ops/pack.py — the same pack-native layout as the SpMM kernels);
- per tile of edges, gather/scatter are ONE-HOT MATMULS on the MXU:
  a_src/h rows via the src-window one-hot, a_dst/grad rows via the
  dst-window one-hot, contributions scattered back with the transposed
  one-hot — ~8x cheaper per edge than XLA's ~20 ns/row take;
- softmax uses a PER-RECEIVER shift m_i = leaky(max_j s_j + d_i)
  (>= every incoming logit of node i since leaky_relu is monotone),
  computed in-kernel from per-head maxS scalars — no segment-max pass,
  and unlike a global shift it keeps each node's exp alive at wide
  head dims; numerator and denominator accumulate into the same
  output block (consecutive dst-window revisits);
- the division happens outside the kernel in XLA (autodiffed); the
  custom VJP covers (d, s, h) -> (numerator | denominator) with two
  backward kernels — one over the dst-major pack (d-half gradients),
  one over the src-major pack (s-half and h gradients);
- attention dropout regenerates keep bits from a stateless hash of the
  ORIGINAL edge id (packed slot orders differ between the two packs).

Everything the kernels index with is static host-packed data; runtime
inputs are O(N) node arrays, so nothing large is embedded into the
compiled program.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_geometric_tpu.ops.kernel_util import edge_onehot, iota_rows
from pytorch_geometric_tpu.ops.pack import pack_windows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _edge_keep_bits(seed, eid2d, hd):
    """uint32 per (original edge id, head), shape of ``eid2d`` — a
    stateless hash so all three kernels regenerate identical dropout
    bits regardless of packing order."""
    x = (eid2d.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ (seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
            + hd.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)))
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    return x ^ (x >> 15)


def _keep_mask(seed, eid2d, tile, H, thresh):
    """(tile, H) keep mask for attention dropout — all heads hashed in
    one vectorised pass (the per-head loop was H serial VPU ops)."""
    hd = jax.lax.broadcasted_iota(jnp.int32, (tile, H), 1)
    bits = _edge_keep_bits(seed, eid2d, hd)
    return (bits >= jnp.uint32(thresh)).astype(jnp.float32)


def _head_expand(H, C):
    """Static (H, H*C) one-hot so per-head broadcast (tile, H) ->
    (tile, H*C) runs as ONE MXU matmul instead of H unrolled
    lane-sliced VPU multiplies (C < 128 wastes most lanes)."""
    hc = H * C
    h_of = jax.lax.broadcasted_iota(jnp.int32, (H, hc), 1) // C
    return (jax.lax.broadcasted_iota(jnp.int32, (H, hc), 0)
            == h_of).astype(jnp.bfloat16)


def _fwd_kernel(gw_ref, dw_ref, first_ref, seed_ref,
                sh_ref, d_ref, m_ref, lsrc_ref, ldst_ref, eid_ref,
                cols_ref, *rest, H, C, rate, slope, tile, window,
                stream=False, out_t=False):
    if stream:
        g1s_ref, gds_ref, out_ref = rest
    else:
        (out_ref,) = rest
    t = pl.program_id(0)
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    row = t % 8
    lsrc = lsrc_ref[row, :]
    ldst = ldst_ref[row, :]
    eid2d = eid_ref[row, :][:, None]                       # (tile, 1)
    if stream:
        g1 = g1s_ref[:].astype(jnp.bfloat16)
        gd = gds_ref[:].astype(jnp.bfloat16)
    else:
        g1 = edge_onehot(lsrc, cols_ref, tile, window)
        gd = edge_onehot(ldst, cols_ref, tile, window)
    em = (eid2d >= 0).astype(jnp.float32)                  # (tile, 1)

    sh = jax.lax.dot(g1, sh_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)   # (tile, H+HC)
    a_s, m_e = sh[:, :H], sh[:, H:]
    a_d = jax.lax.dot(gd, d_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)  # (tile, H)
    # PER-RECEIVER softmax shift m_i = leaky(max_j a_s_j + a_d_i),
    # computed in-kernel from the per-head maxS scalars (m_ref): keeps
    # every node's exp alive (a GLOBAL shift underflowed entire nodes'
    # denominators at wide head dims — measured width-1084 collapse)
    z = a_s + a_d
    z = jnp.where(z > 0, z, slope * z)
    mz = m_ref[0:1, :] + a_d
    z = z - jnp.where(mz > 0, mz, slope * mz)
    expv = jnp.exp(z) * em                                 # (tile, H)
    w = expv
    if rate > 0:
        w = w * (_keep_mask(seed_ref[0], eid2d, tile, H, thresh)
                 * scale)
    w_wide = jax.lax.dot(w.astype(jnp.bfloat16), _head_expand(H, C),
                         preferred_element_type=jnp.float32)
    payload = jnp.concatenate([m_e * w_wide, expv], axis=1)
    if out_t:
        # TRANSPOSED accumulator: the (window, HC+H<=128) out block
        # pads its minor dim to 128 lanes (460 KB of VMEM RMW per tile
        # at window=896 — 16x the real data at conv2's HC+H=4); the
        # (P8, window) orientation is lane-compact.  Same contraction,
        # operands swapped (the dd-compact lesson below).
        P8 = _round_up(H * C + H, 8)
        if P8 > H * C + H:
            payload = jnp.concatenate(
                [payload,
                 jnp.zeros((tile, P8 - H * C - H), payload.dtype)],
            axis=1)
        contrib = jax.lax.dot_general(
            payload.astype(jnp.bfloat16), gd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (P8, window)
    else:
        # scatter by receiver = the gather one-hot contracted on its
        # tile axis (no separate (window, tile) one-hot build)
        contrib = jax.lax.dot_general(
            gd, payload.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = contrib

    @pl.when(first_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _bwd_kernel(gw_ref, dw_ref, first_ref, seed_ref,
                sh_ref, d_ref, m_ref, g_ref, lsrc_ref, ldst_ref, eid_ref,
                cols_ref, *rest, H, C, rate, slope, tile,
                window, side, merge_dd=False, dd_compact=True,
                stream=False, out_t=False):
    """Shared backward body over a pack.

    side='dst' (dst-major pack): scatter by ldst -> dd (window, H).
    side='src' (src-major pack): scatter by lsrc -> [ds | dh]
    (window, H + HC).  With ``merge_dd`` the src kernel ALSO emits dd
    into a full-VMEM (npad, H) block via dynamic-slice accumulation at
    the receiver-window offset — one backward kernel instead of two
    when N is small enough for the block to fit VMEM.
    The caller wires the window index maps so sh is always gathered at
    sender windows and d/g at receiver windows.
    """
    if stream:
        g1s_ref, gds_ref = rest[0], rest[1]
        out_ref, maybe_dd = rest[2], rest[3:]
    else:
        out_ref, maybe_dd = rest[0], rest[1:]
    t = pl.program_id(0)
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    row = t % 8
    lsrc = lsrc_ref[row, :]          # sender locals (gather s|h)
    ldst = ldst_ref[row, :]          # receiver locals (gather d|g)
    eid2d = eid_ref[row, :][:, None]
    if stream:
        g1 = g1s_ref[:].astype(jnp.bfloat16)
        gd = gds_ref[:].astype(jnp.bfloat16)
    else:
        g1 = edge_onehot(lsrc, cols_ref, tile, window)
        gd = edge_onehot(ldst, cols_ref, tile, window)
    em = (eid2d >= 0).astype(jnp.float32)

    sh = jax.lax.dot(g1, sh_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)   # (tile, H+HC)
    a_s, m_e = sh[:, :H], sh[:, H:]
    dg = jax.lax.dot(gd, jnp.concatenate(
        [d_ref[:], g_ref[:]], axis=1).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)    # (tile, H + (HC+H))
    a_d = dg[:, :H]
    gnum = dg[:, H:H + H * C]
    gden = dg[:, H + H * C:]

    zpre = a_s + a_d
    z = jnp.where(zpre > 0, zpre, slope * zpre)
    mz = m_ref[0:1, :] + a_d
    z = z - jnp.where(mz > 0, mz, slope * mz)
    expv = jnp.exp(z) * em                                 # (tile, H)

    expand = _head_expand(H, C)                # (H, HC) one-hot
    # per-head <gnum, m_e> row-dots as an MXU reduce over channels;
    # two-term bf16 split keeps the pre-reduce products at ~fp32
    # precision (a single bf16 round-off failed 3e-2 grad parity)
    prod = gnum * m_e
    p_hi = prod.astype(jnp.bfloat16)
    p_lo = (prod - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = (jax.lax.dot(p_hi, expand.T,
                       preferred_element_type=jnp.float32)
           + jax.lax.dot(p_lo, expand.T,
                         preferred_element_type=jnp.float32))
    if rate > 0:
        keep = _keep_mask(seed_ref[0], eid2d, tile, H, thresh)
        dexp = keep * scale * dot + gden
        w = expv * keep * scale
    else:
        dexp = dot + gden
        w = expv
    dz = expv * dexp
    dz = jnp.where(zpre > 0, dz, slope * dz)               # (tile, H)
    if side == "src":
        w_wide = jax.lax.dot(w.astype(jnp.bfloat16), expand,
                             preferred_element_type=jnp.float32)
        payload = jnp.concatenate([dz, gnum * w_wide], axis=1)
    else:
        payload = dz
    scat = g1 if side == "src" else gd
    if out_t:
        # lane-compact transposed accumulator (see _fwd_kernel)
        pc = payload.shape[1]
        P8 = _round_up(pc, 8)
        if P8 > pc:
            payload = jnp.concatenate(
                [payload, jnp.zeros((tile, P8 - pc), payload.dtype)],
                axis=1)
        contrib = jax.lax.dot_general(
            payload.astype(jnp.bfloat16), scat,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (P8, window)
    else:
        contrib = jax.lax.dot_general(
            scat, payload.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = contrib

    @pl.when(first_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib

    if merge_dd:
        ddf_ref = maybe_dd[0]
        if dd_compact:
            # per-tile COMPACT store, TRANSPOSED: block (H, window) at
            # column t*window — no zeroing, no dynamic-slice RMW (the
            # old full-VMEM accumulator cost ~1.3 us/tile, 38% of the
            # kernel at H=8); the receiver-window segment-sum happens
            # outside in XLA.  Transposed because a (T*W, H) output
            # has an H-wide minor dim that XLA pads to 128 lanes
            # (~280 MB physical at PubMed scale — its relayout copy
            # profiled at 374-660 us/step); (H, T*W) is compact.  The
            # transposed form is free in-kernel: same contraction with
            # the operands swapped.  (Historical: the pre-transpose
            # (window, H) orientation gated this path on H >= 8 because
            # its 1-lane block stores lost at narrow head counts; the
            # transposed store is full-lane at any H, so the gate is
            # now W % 128 == 0 — see dd_compact selection below.)
            ddf_ref[:] = jax.lax.dot_general(
                dz.astype(jnp.bfloat16), gd,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (H, window)
        else:
            ddc = jax.lax.dot_general(
                gd, dz.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (window, H)

            @pl.when(t == 0)
            def _():
                ddf_ref[:] = jnp.zeros_like(ddf_ref)

            off = dw_ref[t] * window
            ddf_ref[pl.ds(off, window), :] = \
                ddf_ref[pl.ds(off, window), :] + ddc


class PackedFlashGat:
    """Whole-layer fused GAT over packed edge tiles (O(E) compute).

    Same call contract as the other flash operators::

        op = PackedFlashGat(adj_bool)          # or (senders, receivers)
        out = op(d, s, h2d, seed, rate=0.6)    # (N, H*C) float32
    """

    def __init__(self, adj_bool=None, senders=None, receivers=None,
                 num_nodes=None, negative_slope: float = 0.2,
                 window: int = 1024, tile: int = 512,
                 interpret: bool = None, onehot: str = "build",
                 merge_dd: bool = None, out_t: bool = True):
        """``onehot``: 'build' regenerates the (tile, window) one-hots
        in-kernel (no HBM cost); 'stream_int8' / 'stream_bf16'
        precompute them once on device and DMA them per tile — the
        VPU-bound win for thin-column attention kernels (the one-hot
        build is ~half the per-tile time at H*C <= 72)."""
        if adj_bool is not None:
            adj = np.asarray(adj_bool)
            receivers, senders = np.nonzero(adj)   # adj[i, j]: edge j->i
            num_nodes = adj.shape[0]
        senders = np.asarray(senders, dtype=np.int64)
        receivers = np.asarray(receivers, dtype=np.int64)
        self.n = int(num_nodes)
        self.E = senders.shape[0]
        self.slope = float(negative_slope)
        self.window, self.tile = window, tile
        assert onehot in ("build", "stream_int8", "stream_bf16")
        self.onehot = onehot
        self._merge_dd = merge_dd
        self.out_t = bool(out_t) and window % 128 == 0
        # dst-major pack (fwd + dd backward): scatter side = receivers
        self.fwd_pack = pack_windows(senders, receivers, self.n,
                                     window=window, tile=tile)
        # src-major pack (ds/dh backward): scatter side = senders; the
        # pack's "src/dst" roles are swapped, tracked explicitly below
        self.bwd_pack = pack_windows(receivers, senders, self.n,
                                     window=window, tile=tile)
        self.num_tiles = self.fwd_pack.num_tiles
        self.inflation = self.fwd_pack.flop_inflation
        self._dev = {}
        for name, pk, swap in (("fwd", self.fwd_pack, False),
                               ("bwd", self.bwd_pack, True)):
            T8 = _round_up(pk.num_tiles, 8)

            def pad_tiles(a, fill=0):
                out = np.full((T8, a.shape[1]), fill, a.dtype)
                out[:a.shape[0]] = a
                return out

            eid = pk.perm.astype(np.int64).reshape(pk.num_tiles, pk.tile)
            eid = np.where(eid >= self.E, -1, eid).astype(np.int32)
            # normalise naming to GRAPH roles: lsend/lrecv locals,
            # send_win/recv_win window ids (swap for the bwd pack)
            self._dev[name] = dict(
                lsend=jnp.asarray(pad_tiles(
                    pk.local_dst if swap else pk.local_src)),
                lrecv=jnp.asarray(pad_tiles(
                    pk.local_src if swap else pk.local_dst)),
                eid=jnp.asarray(pad_tiles(eid, fill=-1)),
                send_win=jnp.asarray(pk.tile_dst_win if swap
                                     else pk.tile_src_win),
                recv_win=jnp.asarray(pk.tile_src_win if swap
                                     else pk.tile_dst_win),
                first=jnp.asarray(pk.tile_first),
            )
        self._interpret = (jax.default_backend() != "tpu"
                           if interpret is None else interpret)
        self._cache = {}

    def _pallas(self, pk, kernel, n_out_cols, H, HC, with_g, out_on,
                extra_full_out=None, dd_compact=True, out_t=False):
        """Build a pallas_call.  Scalar-prefetch order: (gw, dw, first,
        seed) where gw = sender-window ids (gathers s|h), dw =
        receiver-window ids (gathers d and grads); output block follows
        ``out_on`` ('gw' or 'dw').  ``extra_full_out``: column count of
        an additional full-array (npad, cols) output block."""
        W, tile = pk.window, pk.tile
        T = pk.num_tiles
        ndw = max(pk.num_src_windows, pk.num_dst_windows)
        out_idx = ((lambda t, gw, dw, f, s: (gw[t], 0)) if out_on == "gw"
                   else (lambda t, gw, dw, f, s: (dw[t], 0)))
        in_specs = [
            pl.BlockSpec((W, H + HC),
                         lambda t, gw, dw, f, s: (gw[t], 0)),   # s|h
            pl.BlockSpec((W, H),
                         lambda t, gw, dw, f, s: (dw[t], 0)),   # d
            pl.BlockSpec((1, H), lambda t, gw, dw, f, s: (0, 0)),
        ]
        if with_g:
            in_specs.append(pl.BlockSpec(
                (W, HC + H), lambda t, gw, dw, f, s: (dw[t], 0)))
        in_specs += [
            pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0)),
            pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0)),
            pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0)),
            pl.BlockSpec((8, W), lambda t, *_: (0, 0)),
        ]
        if self.onehot != "build":
            in_specs += [pl.BlockSpec((tile, W),
                                      lambda t, *_: (t, 0))] * 2
        if out_t:
            out_idx_t = ((lambda t, gw, dw, f, s: (0, gw[t]))
                         if out_on == "gw"
                         else (lambda t, gw, dw, f, s: (0, dw[t])))
            out_specs = pl.BlockSpec((n_out_cols, W), out_idx_t)
            out_shape = jax.ShapeDtypeStruct((n_out_cols, ndw * W),
                                             jnp.float32)
        else:
            out_specs = pl.BlockSpec((W, n_out_cols), out_idx)
            out_shape = jax.ShapeDtypeStruct((ndw * W, n_out_cols),
                                             jnp.float32)
        if extra_full_out is not None:
            if dd_compact:
                # per-tile compact TRANSPOSED (H, W) blocks, reduced by
                # receiver window in XLA afterwards (see _bwd_kernel
                # merge_dd comment on why the (H, T*W) orientation)
                out_specs = [out_specs,
                             pl.BlockSpec((extra_full_out, W),
                                          lambda t, gw, dw, f, s:
                                          (0, t))]
                out_shape = [out_shape,
                             jax.ShapeDtypeStruct(
                                 (extra_full_out, T * W), jnp.float32)]
            else:
                npad_ = ndw * W
                out_specs = [out_specs,
                             pl.BlockSpec((npad_, extra_full_out),
                                          lambda t, gw, dw, f, s:
                                          (0, 0))]
                out_shape = [out_shape,
                             jax.ShapeDtypeStruct(
                                 (npad_, extra_full_out), jnp.float32)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(T,), in_specs=in_specs,
            out_specs=out_specs)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=self._interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024))

    def _build(self, H: int, C: int, rate: float):
        HC = H * C
        W = self.window
        cols = iota_rows(W)
        n = self.n
        nw = self.fwd_pack.num_src_windows
        npad = nw * W
        stream = self.onehot != "build"
        kw = dict(H=H, C=C, rate=rate, slope=self.slope, tile=self.tile,
                  window=W, stream=stream)
        out_t = self.out_t
        P8 = _round_up(HC + H, 8)
        fwd_call = self._pallas(
            self.fwd_pack,
            functools.partial(_fwd_kernel, out_t=out_t, **kw),
            P8 if out_t else HC + H, H, HC, with_g=False, out_on="dw",
            out_t=out_t)
        # dd is only (npad, H): when it fits VMEM comfortably, emit it
        # from the src-pack backward kernel (dynamic-slice accumulation
        # at receiver-window offsets) and skip the dst-pack pass
        merge_dd = (npad * H * 4 <= 8 * 1024 * 1024
                    if self._merge_dd is None else self._merge_dd)
        # transposed (H, T*W) compact stores are full-lane (1, window)
        # blocks even at H=1, so every head count takes the compact
        # path (the pre-transpose (T*W, H) form lost at H < 8: 1-LANE
        # block stores, profiled +0.28 ms/step on conv2).  The lane-dim
        # block now needs window % 128 == 0; odd windows fall back to
        # the dynamic-slice VMEM accumulator.
        dd_compact = W % 128 == 0
        P8b = _round_up(H + HC, 8)
        H8 = _round_up(H, 8)
        if merge_dd:
            bwd_dst_call = None
            bwd_src_call = self._pallas(
                self.bwd_pack,
                functools.partial(_bwd_kernel, side="src",
                                  merge_dd=True, dd_compact=dd_compact,
                                  out_t=out_t, **kw),
                P8b if out_t else H + HC, H, HC, with_g=True,
                out_on="gw", extra_full_out=H, dd_compact=dd_compact,
                out_t=out_t)
        else:
            bwd_dst_call = self._pallas(
                self.fwd_pack,
                functools.partial(_bwd_kernel, side="dst",
                                  out_t=out_t, **kw),
                H8 if out_t else H, H, HC, with_g=True, out_on="dw",
                out_t=out_t)
            bwd_src_call = self._pallas(
                self.bwd_pack,
                functools.partial(_bwd_kernel, side="src",
                                  out_t=out_t, **kw),
                P8b if out_t else H + HC, H, HC, with_g=True,
                out_on="gw", out_t=out_t)
        dv_f, dv_b = self._dev["fwd"], self._dev["bwd"]

        def pad_rows(x):
            return jnp.pad(x, ((0, npad - x.shape[0]), (0, 0)))

        @jax.custom_vjp
        def raw(d, s, h2d, seed):
            num_den, _ = _raw_fwd(d, s, h2d, seed)
            return num_den

        if stream:
            from pytorch_geometric_tpu.ops.kernel_util import (
                onehot_blocks)
            bdt = (jnp.int8 if self.onehot == "stream_int8"
                   else jnp.bfloat16)
            tile = self.tile

            # traced lazily per call; XLA loop-invariant code motion
            # hoists the build out of the caller's epoch scan
            def blk(dv):
                return (onehot_blocks(dv["lsend"], tile, W, bdt),
                        onehot_blocks(dv["lrecv"], tile, W, bdt))
        else:
            def blk(dv):
                return ()

        def _raw_fwd(d, s, h2d, seed):
            seed_i = jnp.reshape(seed.astype(jnp.int32), (1,))
            # per-head maxS scalars for the PER-RECEIVER softmax shift
            # m_i = leaky(maxS + a_d_i), computed in-kernel (see
            # _fwd_kernel; the shift carries no gradient)
            m = jax.lax.stop_gradient(
                jnp.max(s, axis=0)).reshape(1, H)
            sh = pad_rows(jnp.concatenate([s, h2d], axis=1))
            dp = pad_rows(d)
            acc = fwd_call(dv_f["send_win"], dv_f["recv_win"],
                           dv_f["first"], seed_i,
                           sh, dp, m, dv_f["lsend"], dv_f["lrecv"],
                           dv_f["eid"], cols, *blk(dv_f))
            if out_t:
                # lane-compact (P8, npad) kernel output -> one XLA
                # transpose back to the (n, HC+H) caller orientation
                acc = acc[:HC + H, :n].T
                return acc, (sh, dp, m, seed_i)
            return acc[:n], (sh, dp, m, seed_i)

        def _raw_bwd(res, g_acc):
            sh, dp, m, seed_i = res
            gp = jnp.pad(g_acc, ((0, npad - n), (0, 0)))   # (npad, HC+H)
            if merge_dd:
                dsdh, dd_tiles = bwd_src_call(
                    dv_b["send_win"], dv_b["recv_win"], dv_b["first"],
                    seed_i, sh, dp, m, gp, dv_b["lsend"],
                    dv_b["lrecv"], dv_b["eid"], cols, *blk(dv_b))
                if out_t:
                    dsdh = dsdh[:H + HC].T         # (npad, H+HC)
                if dd_compact:
                    # dd_tiles is (H, T*W) — compact minor dim (a
                    # (T*W, H) orientation is 128-lane padded, ~280 MB
                    # physical; its relayout copy profiled at 374-660
                    # us/step).  Per-head segment-sum over the tile
                    # axis, then one small (H, nw, W) -> (npad, H)
                    # transpose (~0.8 MB)
                    T_b = self.bwd_pack.num_tiles
                    dd3 = jax.vmap(lambda m: jax.ops.segment_sum(
                        m, dv_b["recv_win"][:T_b],
                        num_segments=npad // W))(
                            dd_tiles.reshape(H, T_b, W))
                    dd = dd3.transpose(1, 2, 0).reshape(npad, H)
                else:
                    dd = dd_tiles
            else:
                dd = bwd_dst_call(dv_f["send_win"], dv_f["recv_win"],
                                  dv_f["first"], seed_i,
                                  sh, dp, m, gp, dv_f["lsend"],
                                  dv_f["lrecv"], dv_f["eid"], cols,
                                  *blk(dv_f))
                dsdh = bwd_src_call(dv_b["send_win"], dv_b["recv_win"],
                                    dv_b["first"], seed_i,
                                    sh, dp, m, gp, dv_b["lsend"],
                                    dv_b["lrecv"], dv_b["eid"], cols,
                                    *blk(dv_b))
                if out_t:
                    dd = dd[:H].T                  # (npad, H)
                    dsdh = dsdh[:H + HC].T
            return (dd[:n], dsdh[:n, :H], dsdh[:n, H:],
                    jnp.zeros((), jnp.float32))

        raw.defvjp(_raw_fwd, _raw_bwd)

        # (H, HC) head-broadcast matrix in f32 for the outer division
        hexp = np.kron(np.eye(H, dtype=np.float32),
                       np.ones((1, C), np.float32))

        def call(d, s, h2d, seed):
            acc = raw(d, s, h2d, seed)
            num, den = acc[:, :HC], acc[:, HC:]
            # Underflow guard on the (N, H) denominator ONLY: when a
            # node's best incoming a_s sits > ~37 below maxS its den
            # (and num, same exp factors) vanish below 1e-16 — the
            # attention there is numerically meaningless, so the
            # output is ~0 and the gradient must flow through a
            # FINITE branch (1/max(den, eps) backward reached 1e20,
            # whose global-norm square overflowed f32 and NaN'd the
            # wide-width pipeline runs — measured).  where() zeroes
            # the dead branch's cotangent; cost is one H-wide select.
            den = jnp.where(den < 1e-16, 1.0, den)
            # head-broadcast via one tiny MXU matmul, then a full-lane
            # 2-D divide: the per-head slice loop this replaces ran 8
            # narrow 8/128-lane passes (~1 ms/step of XLA glue), and a
            # reshape-to-3D divide materialised a 374 us/step copy in
            # its transpose
            return num / (den @ hexp)

        return {"call": call, "raw": raw}

    def __call__(self, d, s, h2d, seed, rate: float = 0.0,
                 raw_out: bool = False):
        """``raw_out=True`` returns the undivided (N, H*C + H) num‖den
        accumulator so callers that only consume a few rows (e.g. a
        train-mask loss) can gather BEFORE the narrow-lane division
        chain — at PubMed scale the (N, 3)-shaped softmax/div glue is
        128-lane padded and costs ~0.5 ms/step when run over all N."""
        H = d.shape[1]
        C = h2d.shape[1] // H
        key = (H, C, float(rate))
        if key not in self._cache:
            self._cache[key] = self._build(*key)
        fns = self._cache[key]
        fn = fns["raw"] if raw_out else fns["call"]
        return fn(d, s, h2d, jnp.asarray(seed, jnp.float32))
