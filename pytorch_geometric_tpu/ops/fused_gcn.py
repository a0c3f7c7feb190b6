"""Fused 2-layer GCN: both aggregations in ONE Pallas launch.

The PubMed full-graph floor account (PERF.md round 5) showed the epoch
is LAUNCH-bound: four ~0.43 ms aggregation passes are 78% of the
2.25 ms epoch, each carrying ~0.1 ms of in-scan kernel overhead, with
the XLA elementwise between them adding more dispatches and idle.
TPU grid steps execute SEQUENTIALLY, so one kernel can run phase 1
(h1_pre = A z1) into a VMEM scratch accumulator, then phase 2
(out = A (drop(relu(h1_pre + b1)) @ W2)) reading the completed
scratch — two launches become one, and the inter-layer elementwise
(bias, relu, dropout, the W2 matmul) runs per-window inside the
kernel.  The backward runs the mirrored two phases over the
transposed pack.

Dropout uses a stateless integer hash of (feature, global column,
seed) so forward and backward agree bit-exactly without materialising
the (N, 16) mask.

Scope: hidden <= 120 channels, classes <= 120 (single 128-lane block),
out_t orientation; built for the citation fullgraph shapes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_geometric_tpu.ops.kernel_util import edge_onehot, iota_rows
from pytorch_geometric_tpu.ops.spmm import SpmmOperator


def _round_up(x, m):
    return -(-x // m) * m


def _keep_mask(seed_ref, feat_rows, col_base, window, rate):
    """(feat_rows, window) keep mask from an integer hash (stateless,
    reproduced identically in forward and backward)."""
    if rate <= 0.0:
        return None
    thresh = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    f = jax.lax.broadcasted_iota(jnp.int32, (feat_rows, window), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (feat_rows, window), 1) \
        + col_base
    h = (f.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         + c.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         + seed_ref[0].astype(jnp.uint32))
    h = (h ^ (h >> 15)) * jnp.uint32(0x2C1B3C6D)
    h = (h ^ (h >> 12)) * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return h < thresh


def _fused_kernel(T, window, tile, H8, C8, rate, bwd,
                  seed_ref, gw_ref, dw_ref, first_ref, last_ref,
                  x_ref, w2_ref, b1_ref, h1in_ref,
                  lsrc_ref, ldst_ref, wgt_ref, cols_ref,
                  out1_ref, out2_ref, acc_ref):
    """Grid (2T,): t<T = phase 1 (aggregate x into out1/acc);
    t>=T = phase 2 (transform acc slab, aggregate into out2).

    Forward (bwd=False):  x = z1 (N, H);   out1 = h1_pre^T (H8, Np);
      transform = relu(h1_pre + b1) [drop] @ W2;  out2 = z2agg^T.
    Backward (bwd=True):  x = g2 (N, C);   out1 = gA2^T  (C8, Np);
      transform = ((gA2^T W2^T) * drop * relu'(h1in)) — h1in is the
      forward's h1_pre^T; out2 = dz1^T (H8, Np).  Same pack both
      phases (the caller passes the TRANSPOSED pack's tables).
    """
    t = pl.program_id(0)
    tt = jnp.where(t < T, t, t - T)
    row = tt % 8
    lsrc = lsrc_ref[row, :]
    ldst = ldst_ref[row, :]
    w = wgt_ref[row, :]
    phase1 = t < T
    first = first_ref[tt] == 1
    r1 = C8 if bwd else H8       # rows of phase-1 accumulator
    r2 = H8 if bwd else C8       # rows of phase-2 output

    @pl.when(phase1)
    def _():
        gat = edge_onehot(lsrc, cols_ref, tile, window)
        scat = edge_onehot(ldst, cols_ref, tile, window)
        gathered = jax.lax.dot(gat, x_ref[:].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        gathered = (gathered * w[:, None]).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            gathered[:, :r1], scat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (r1, window)
        dwv = dw_ref[tt]
        # ONLY the VMEM scratch accumulates tile by tile (the v1
        # double accumulation out1+scratch measured slower than two
        # separate launches); the h1_pre residual (out1) is written
        # ONCE per dst window, at the window's LAST tile, as a copy of
        # the completed slab — every window has >= 1 tile (padding
        # tiles included), so coverage is total

        @pl.when(first)
        def _():
            acc_ref[:r1, pl.ds(dwv * window, window)] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[:r1, pl.ds(dwv * window, window)] = \
                acc_ref[:r1, pl.ds(dwv * window, window)] + contrib

        @pl.when(last_ref[tt] == 1)
        def _():
            out1_ref[:] = acc_ref[:r1, pl.ds(dwv * window, window)]

    @pl.when(jnp.logical_not(phase1))
    def _():
        gwv = gw_ref[tt]
        slab = acc_ref[:r1, pl.ds(gwv * window, window)]
        if not bwd:
            # h1d = drop(relu(h1_pre + b1));  z2 = W2^T @ h1d
            h = jnp.maximum(slab + b1_ref[0:1, :r1].T, 0.0)
            keep = _keep_mask(seed_ref, r1, gwv * window, window, rate)
            if keep is not None:
                h = jnp.where(keep, h / (1.0 - rate), 0.0)
            z2 = jax.lax.dot(w2_ref[:r2, :r1].astype(jnp.bfloat16),
                             h.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
        else:
            # dh1 = (W2 @ gA2) * drop' * relu'(h1_pre)
            dh1d = jax.lax.dot(w2_ref[:r2, :r1].astype(jnp.bfloat16),
                               slab.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            h1s = h1in_ref[:r2, pl.ds(gwv * window, window)]
            keep = _keep_mask(seed_ref, r2, gwv * window, window, rate)
            act = (h1s + b1_ref[0:1, :r2].T) > 0.0
            if keep is not None:
                act = jnp.logical_and(act, keep)
                dh1d = dh1d / (1.0 - rate)
            z2 = jnp.where(act, dh1d, 0.0)
        # gather this tile's edges from the (r2, window) slab, weight,
        # scatter into the (r2, window) out block
        gat = edge_onehot(lsrc, cols_ref, tile, window)
        scat = edge_onehot(ldst, cols_ref, tile, window)
        ge = jax.lax.dot_general(
            z2.astype(jnp.bfloat16), gat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (r2, tile)
        ge = (ge * w[None, :]).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            ge, scat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (r2, window)

        @pl.when(first)
        def _():
            out2_ref[:] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out2_ref[:] = out2_ref[:] + contrib


class FusedGcn2:
    """out = A (drop(relu(A z1 + b1)) @ W2) in one kernel per
    direction, differentiable in (z1, W2, b1).

    ``op`` is a bound :class:`SpmmOperator` (same window for src and
    dst; fwd pack drives the forward, bwd pack the backward).  The
    caller applies b2 and the loss outside.
    """

    def __init__(self, senders, receivers, num_nodes, weights, *,
                 hidden: int, classes: int, window=1024, tile=256,
                 dropout_rate: float = 0.5):
        self.op = SpmmOperator(senders, receivers, num_nodes,
                               window=window, tile=tile,
                               compute_dtype=jnp.bfloat16, light=True)
        self.N = int(num_nodes)
        self.H8 = _round_up(hidden, 8)
        self.C8 = _round_up(classes, 8)
        self.hidden, self.classes = hidden, classes
        self.window, self.tile = window, tile
        self.rate = float(dropout_rate)
        self.nw = self.op.fwd.num_src_windows
        assert self.op.fwd.num_dst_windows == self.nw
        self._wp = {
            "fwd": np.asarray(self.op.pack_weights_host(weights, "fwd")),
            "bwd": np.asarray(self.op.pack_weights_host(weights, "bwd")),
        }
        self._interpret = jax.default_backend() != "tpu"
        self._calls = {}

    def _call(self, which, r1, r2):
        key = (which, r1, r2)
        if key in self._calls:
            return self._calls[key]
        pk = self.op.fwd if which == "fwd" else self.op.bwd
        dv = self.op._dev[which]
        W, tile, nw = self.window, self.tile, self.nw
        T = pk.num_tiles
        npad = nw * W
        bwd = which == "bwd"
        rate = self.rate

        def im_tables(t, *_):
            return (jnp.where(t < T, t, t - T) // 8, 0)

        in_specs = [
            # x slab: phase-1 gathers from it; parked on window 0 in
            # phase 2 (reads are ignored there)
            pl.BlockSpec((W, 128), lambda t, s, gw, dw, f, lst: (
                jnp.where(t < T, gw[jnp.where(t < T, t, 0)], 0), 0)),
            pl.BlockSpec((16, 128), lambda t, *_: (0, 0)),    # W2
            pl.BlockSpec((8, 128), lambda t, *_: (0, 0)),     # b1
            # h1in (bwd only; fwd passes a dummy (8, npad+W))
            pl.BlockSpec((r2 if bwd else 8, npad + W),
                         lambda t, *_: (0, 0)),
            pl.BlockSpec((8, tile), im_tables),               # lsrc
            pl.BlockSpec((8, tile), im_tables),               # ldst
            pl.BlockSpec((8, tile), im_tables),               # w
            pl.BlockSpec((8, W), lambda t, *_: (0, 0)),       # cols
        ]
        # outputs park on a dummy trailing window in the off phase
        out_specs = [
            pl.BlockSpec((r1, W), lambda t, s, gw, dw, f, lst: (
                0, jnp.where(t < T, dw[jnp.where(t < T, t, 0)], nw))),
            pl.BlockSpec((r2, W), lambda t, s, gw, dw, f, lst: (
                0, jnp.where(t < T, nw,
                             dw[jnp.where(t < T, 0, t - T)]))),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((r1, npad + W), jnp.float32),
            jax.ShapeDtypeStruct((r2, npad + W), jnp.float32),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(2 * T,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((max(r1, 8), npad),
                                       jnp.float32)],
        )
        kernel = functools.partial(
            _fused_kernel, T, W, tile, self.H8, self.C8, rate, bwd)
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self._interpret)

        dwn = np.asarray(dv["tile_dst_win"])
        tile_last = np.zeros(T, np.int32)
        tile_last[:-1] = (dwn[1:] != dwn[:-1]).astype(np.int32)
        tile_last[-1] = 1
        tile_last_j = jnp.asarray(tile_last)

        def run(x_pad, w2blk, b1blk, h1in, seed):
            return call(
                jnp.asarray(seed).reshape(1).astype(jnp.int32),
                dv["tile_src_win"], dv["tile_dst_win"],
                dv["tile_first"], tile_last_j,
                x_pad, w2blk, b1blk, h1in,
                dv["local_src"].astype(jnp.int32),
                dv["local_dst"].astype(jnp.int32),
                jnp.asarray(self._wp[which]), iota_rows(W))

        self._calls[key] = run
        return run

    def _pad_cols(self, v, rows, label_rows):
        """(n, F) -> (rows*W-padded slab layout helper)."""
        raise NotImplementedError

    def __call__(self, z1, W2, b1, seed):
        return _fused_apply(self, z1, W2, b1, seed)

    # --- primal/backward bodies ---------------------------------------

    def _fwd(self, z1, W2, b1, seed):
        N, H8, C8, nw, W = self.N, self.H8, self.C8, self.nw, \
            self.window
        npad = nw * W
        x_pad = jnp.zeros((npad, 128), jnp.bfloat16)
        x_pad = x_pad.at[:N, : self.hidden].set(
            z1.astype(jnp.bfloat16))
        # W2 block: rows = classes (phase-2 left operand W2^T)
        w2blk = jnp.zeros((16, 128), jnp.float32)
        w2blk = w2blk.at[: self.classes, : self.hidden].set(W2.T)
        b1blk = jnp.zeros((8, 128), jnp.float32)
        b1blk = b1blk.at[0, : self.hidden].set(b1)
        h1dummy = jnp.zeros((8, npad + W), jnp.float32)
        run = self._call("fwd", H8, C8)
        h1_pre_t, out2_t = run(x_pad, w2blk, b1blk, h1dummy, seed)
        return h1_pre_t[:, :npad], out2_t[:, :npad]

    def _bwd(self, g2, W2, b1, h1_pre_t, seed):
        N, H8, C8, nw, W = self.N, self.H8, self.C8, self.nw, \
            self.window
        npad = nw * W
        g_pad = jnp.zeros((npad, 128), jnp.bfloat16)
        g_pad = g_pad.at[:N, : self.classes].set(
            g2.astype(jnp.bfloat16))
        # phase-2 left operand is W2 itself: (hidden, classes)
        w2blk = jnp.zeros((16, 128), jnp.float32)
        w2blk = w2blk.at[: self.hidden, : self.classes].set(W2)
        b1blk = jnp.zeros((8, 128), jnp.float32)
        b1blk = b1blk.at[0, : self.hidden].set(b1)
        h1in = jnp.zeros((H8, npad + W), jnp.float32)
        h1in = h1in.at[:, :npad].set(h1_pre_t)
        run = self._call("bwd", C8, H8)
        gA2_t, dz1_t = run(g_pad, w2blk, b1blk, h1in, seed)
        return gA2_t[:, :npad], dz1_t[:, :npad]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_apply(op: FusedGcn2, z1, W2, b1, seed):
    _, out2_t = op._fwd(z1, W2, b1, seed)
    return out2_t[: op.classes, : op.N].T


def _fused_apply_fwd(op, z1, W2, b1, seed):
    h1_pre_t, out2_t = op._fwd(z1, W2, b1, seed)
    return out2_t[: op.classes, : op.N].T, \
        (z1, W2, b1, h1_pre_t, seed)


def _fused_apply_bwd(op, res, g):
    z1, W2, b1, h1_pre_t, seed = res
    gA2_t, dz1_t = op._bwd(g, W2, b1, h1_pre_t, seed)
    N, H, C = op.N, op.hidden, op.classes
    # recompute h1d (one fused XLA elementwise pass) for dW2/db1
    h1_pre = h1_pre_t[:H, :N].T
    h = jnp.maximum(h1_pre + b1[None, :], 0.0)
    if op.rate > 0.0:
        keep = _host_keep_mask(seed, H, N, op.window, op.rate)
        h1d = jnp.where(keep, h / (1.0 - op.rate), 0.0)
    else:
        h1d = h
        keep = None
    gA2 = gA2_t[:C, :N].T                      # (N, C) = A^T g
    dW2 = h1d.T @ gA2
    # db1 = sum_n dh1;  dh1 = (gA2 @ W2^T) * keep' * relu'
    dh1d = gA2 @ W2.T
    act = h1_pre + b1[None, :] > 0.0
    if keep is not None:
        act = jnp.logical_and(act, keep)
        dh1d = dh1d / (1.0 - op.rate)
    dh1 = jnp.where(act, dh1d, 0.0)
    db1 = jnp.sum(dh1, axis=0)
    dz1 = dz1_t[:H, :N].T
    return dz1.astype(z1.dtype), dW2.astype(W2.dtype), \
        db1.astype(b1.dtype), jnp.zeros_like(seed)


_fused_apply.defvjp(_fused_apply_fwd, _fused_apply_bwd)


def _host_keep_mask(seed, H, N, window, rate):
    """XLA replica of the in-kernel hash over the (N, H) grid (note:
    kernel grid is (feat, global col) = (H, node) — transpose)."""
    thresh = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    f = jnp.arange(H, dtype=jnp.uint32)[None, :]
    c = jnp.arange(N, dtype=jnp.uint32)[:, None]
    h = (f * jnp.uint32(0x9E3779B1) + c * jnp.uint32(0x85EBCA77)
         + seed.astype(jnp.int32).astype(jnp.uint32))
    h = (h ^ (h >> 15)) * jnp.uint32(0x2C1B3C6D)
    h = (h ^ (h >> 12)) * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return h < thresh
