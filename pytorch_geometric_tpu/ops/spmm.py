"""SpMM — the hot op under every message-passing aggregation.

Reference counterpart: torch-sparse's ``spmm`` + torch-scatter's
``scatter_add`` (reference requirement.txt:1-3), the per-edge
gather/segment-reduce in every ``propagate`` call (reference call stack
SURVEY §3.1/§3.5: gather x_j = x[edge_index[0]], message, scatter-add by
edge_index[1]).

Two device paths:

1. ``spmm`` — XLA gather + segment reduce.  Always correct, autodiff'd by
   XLA, good baseline on TPU when edges are sorted by receiver.
2. ``SpmmOperator`` — Pallas kernel.  Host-side windowed packing
   (:mod:`pytorch_geometric_tpu.ops.pack`) turns gather/scatter into
   one-hot matmuls on the MXU with in-VMEM accumulation over destination
   windows; a custom VJP reuses the transposed packing for ``dx`` so the
   backward is another MXU-resident SpMM.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_geometric_tpu.ops.kernel_util import edge_onehot, iota_rows
from pytorch_geometric_tpu.ops.pack import pack_windows
from pytorch_geometric_tpu.ops.segment import scatter


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def spmm(senders, receivers, x, num_nodes, weights=None, reduce="sum",
         indices_are_sorted=False):
    """out[r] = reduce_{e: receivers[e]==r} weights[e] * x[senders[e]].

    XLA path: per-edge gather then segment reduce.  ``num_nodes`` is the
    static output row count (padded node count of the graph bucket).
    """
    msg = jnp.take(x, senders, axis=0)
    if weights is not None:
        w = weights.reshape(weights.shape + (1,) * (msg.ndim - weights.ndim))
        msg = msg * w
    return scatter(msg, receivers, num_nodes, reduce=reduce,
                   indices_are_sorted=indices_are_sorted)


# ---------------------------------------------------------------------------
# Pallas windowed one-hot SpMM
# ---------------------------------------------------------------------------

def _spmm_kernel(window, tile, compute_dtype, out_t, window_dst,
                 src_w_ref, dst_w_ref, first_ref,   # scalar prefetch
                 x_ref, lsrc_ref, ldst_ref, w_ref,  # tensor inputs
                 cols_ref, out_ref):
    """One grid step: `tile` edges between one (src window, dst window).

    Gather and scatter are expressed as one-hot matmuls so both run on the
    MXU; padding edges carry weight 0 and vanish.  Output accumulates in
    VMEM across consecutive tiles of the same destination window.
    ``compute_dtype=bfloat16`` runs the one-hot matmuls at full MXU rate
    (one-hot entries are exact in bf16; accumulation stays fp32).

    The column iota arrives hoisted as a constant (8, window) block
    (``cols_ref`` — round-2 lesson: the in-kernel 32-bit iota costs as
    much as the compare), and the scatter is the destination one-hot
    contracted on its TILE axis (dot_general), so no (window, tile)
    transposed one-hot is ever built.
    """
    del src_w_ref, dst_w_ref
    t = pl.program_id(1)
    # Per-tile arrays are blocked (8, tile) for sublane alignment; row
    # t % 8 of the block holds this tile's data.
    row = t % 8
    lsrc = lsrc_ref[row, :]                    # (tile,)
    ldst = ldst_ref[row, :]
    w = w_ref[row, :]
    wd = window if window_dst is None else window_dst
    gat = edge_onehot(lsrc, cols_ref, tile, window, dtype=compute_dtype)
    scat = edge_onehot(ldst, cols_ref, tile, wd, dtype=compute_dtype)
    gathered = jax.lax.dot(gat, x_ref[:].astype(compute_dtype),
                           preferred_element_type=jnp.float32)
    gathered = (gathered * w[:, None]).astype(compute_dtype)
    if out_t:
        # lane-compact transposed accumulator for narrow F (see
        # packed_rgcn._fwd_kernel): the (window, f_tile) block pads
        # its minor dim to 128 lanes; (out_t<=64 rows, window) is
        # compact.  ``out_t`` = real (8-padded) column count.
        contrib = jax.lax.dot_general(
            gathered[:, :out_t], scat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (out_t, window)
    else:
        # scatter by receiver: contract the (tile, window) dst one-hot
        # on its tile axis -> (window, f_tile)
        contrib = jax.lax.dot_general(
            scat, gathered, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = contrib

    @pl.when(first_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _spmm_pallas_raw(x_pad, w_packed, local_src, local_dst,
                     tile_src_win, tile_dst_win, tile_first,
                     *, window, tile, n_dst_windows, f_tile,
                     compute_dtype=jnp.float32, out_rows=None,
                     window_dst=None):
    """Invoke the Pallas kernel.  x_pad: (n_src_windows*window, Fp).

    ``out_rows``: emit the lane-compact TRANSPOSED (out_rows, N)
    output instead of (N, f_tile) — for narrow F (requires one f
    block, i.e. fp == f_tile, and the dst window % 128 == 0).
    ``window_dst``: asymmetric windows — source slabs at ``window``
    rows, output blocks at ``window_dst`` rows (the round-5 scattered
    tail lever: wide src windows merge sub-tile buckets, the narrow
    dst window keeps the out-block accumulation small)."""
    T = tile_src_win.shape[0]  # real tile count (w_packed rows padded to 8)
    fp = x_pad.shape[1]
    n_ft = fp // f_tile
    wd = window if window_dst is None else window_dst
    if out_rows is not None:
        assert n_ft == 1 and wd % 128 == 0
        out_specs = pl.BlockSpec(
            (out_rows, wd),
            lambda j, t, srcw, dstw, first: (0, dstw[t]))
        out_shape = jax.ShapeDtypeStruct(
            (out_rows, n_dst_windows * wd), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (wd, f_tile),
            lambda j, t, srcw, dstw, first: (dstw[t], j))
        out_shape = jax.ShapeDtypeStruct(
            (n_dst_windows * wd, fp), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ft, T),
        in_specs=[
            pl.BlockSpec((window, f_tile),
                         lambda j, t, srcw, dstw, first: (srcw[t], j)),
            pl.BlockSpec((8, tile), lambda j, t, *_: (t // 8, 0)),
            pl.BlockSpec((8, tile), lambda j, t, *_: (t // 8, 0)),
            pl.BlockSpec((8, tile), lambda j, t, *_: (t // 8, 0)),
            pl.BlockSpec((8, max(window, wd)),
                         lambda j, t, *_: (0, 0)),
        ],
        out_specs=out_specs,
    )
    kernel = functools.partial(_spmm_kernel, window, tile,
                               compute_dtype, out_rows,
                               None if wd == window else wd)
    flops = 2 * T * tile * (window + wd) * fp
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=T * (tile * 12 + (window + wd) * fp * 4),
            transcendentals=0),
        # Tests run on a virtual CPU mesh; Mosaic only targets TPU.
        interpret=jax.default_backend() != "tpu",
    )(tile_src_win, tile_dst_win, tile_first,
      x_pad, local_src, local_dst, w_packed,
      iota_rows(max(window, wd)))


class SpmmOperator:
    """Pallas SpMM bound to a fixed edge structure.

    Built host-side once per graph bucket (loader-time).  Differentiable
    in (weights, x): ``dx`` runs the transposed packing through the same
    kernel; ``dweights`` is the SDDMM ``sum_f g[recv] * x[send]``.

    Usage::

        op = SpmmOperator(senders, receivers, num_nodes)
        out = op(weights, x)          # (num_nodes, F)
    """

    def __init__(self, senders, receivers, num_nodes, *, window=256,
                 tile=256, compute_dtype=jnp.float32, light=False,
                 window_dst=None):
        """``light=True`` skips uploading the edge id permutation and
        edge endpoint lists to the device — only the static-weight
        entry points (:meth:`bind`, :meth:`bind_external` with host
        weight packing) work then, but a 100M-edge operator saves
        ~1.5 GB of device tables and their transfer time.

        ``window_dst``: asymmetric windows — source slabs at
        ``window`` rows, output blocks at ``window_dst`` (the backward
        pack swaps the pair).  Round-5 scattered-tail lever."""
        self.compute_dtype = compute_dtype
        if tile % 128:
            raise ValueError(f"tile must be a multiple of 128, got {tile}")
        if window % 8:
            raise ValueError(f"window must be a multiple of 8, got {window}")
        senders = np.asarray(senders)
        receivers = np.asarray(receivers)
        self.window, self.tile = window, tile
        self.window_dst = window_dst
        wd = window if window_dst is None else int(window_dst)
        self.num_nodes = int(num_nodes)
        self.light = bool(light)
        # fwd/bwd packs run concurrently: the native counting sort
        # releases the GIL inside ctypes, so the two directions overlap
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(2) as ex:
            f_fwd = ex.submit(pack_windows, senders, receivers,
                              num_nodes, window=window, tile=tile,
                              window_dst=window_dst)
            f_bwd = ex.submit(pack_windows, receivers, senders,
                              num_nodes, window=wd, tile=tile,
                              window_dst=(None if window_dst is None
                                          else window))
            self.fwd = f_fwd.result()
            self.bwd = f_bwd.result()
        if not light:
            self.senders = jnp.asarray(senders, dtype=jnp.int32)
            self.receivers = jnp.asarray(receivers, dtype=jnp.int32)
        self._dev = {}
        for name, pk in (("fwd", self.fwd), ("bwd", self.bwd)):
            T8 = _round_up(pk.num_tiles, 8)

            def pad_rows(a):
                if a.shape[0] == T8:
                    return a
                pad = np.zeros((T8 - a.shape[0],) + a.shape[1:], a.dtype)
                return np.concatenate([a, pad])

            # int16 local indices (< window <= 32767) halve the H2D
            # table transfer; consumers widen to int32 in-jit before
            # the kernel (~0.1 ms per call)
            idt = np.int16 if max(window, wd) <= 32767 else np.int32
            self._dev[name] = dict(
                local_src=jnp.asarray(
                    pad_rows(pk.local_src).astype(idt)),
                local_dst=jnp.asarray(
                    pad_rows(pk.local_dst).astype(idt)),
                tile_src_win=jnp.asarray(pk.tile_src_win),
                tile_dst_win=jnp.asarray(pk.tile_dst_win),
                tile_first=jnp.asarray(pk.tile_first),
            )
            if not light:
                self._dev[name]["perm"] = jnp.asarray(pk.perm)

    # --- internals --------------------------------------------------------

    def pack_weights(self, weights, which: str = "fwd"):
        """Route per-edge weights into packed (T8, tile) layout.

        This is a per-edge gather (~20 ns/edge on TPU regardless of
        width — the dominant cost of a dynamic-weight call).  For
        weights that are static per graph (GCN's normalised adjacency),
        call once and reuse via :meth:`apply_packed`."""
        pk = self.fwd if which == "fwd" else self.bwd
        dv = self._dev[which]
        w_ext = jnp.concatenate(
            [weights.astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
        T = pk.num_tiles
        T8 = _round_up(T, 8)
        w_packed = jnp.take(w_ext, dv["perm"]).reshape(T, pk.tile)
        if T8 != T:  # pad tile-row dim for (8, tile) blocking
            w_packed = jnp.concatenate(
                [w_packed, jnp.zeros((T8 - T, pk.tile), jnp.float32)])
        return w_packed

    def apply_packed(self, w_packed, x, which: str = "fwd"):
        """SpMM with pre-packed weights — no per-edge gather on the hot
        path; all remaining work is windowed MXU matmuls."""
        pk = self.fwd if which == "fwd" else self.bwd
        dv = self._dev[which]
        N, F = self.num_nodes, x.shape[1]
        f_tile = 128 if F > 128 else _round_up(max(F, 1), 128)
        fp = _round_up(F, f_tile)
        # bf16 slab: halves the per-tile window DMA when the caller
        # opted into bf16 compute (the MXU consumed bf16 anyway)
        xdt = jnp.bfloat16 if self.compute_dtype == jnp.bfloat16 \
            else jnp.float32
        x_pad = jnp.zeros((pk.num_src_windows * pk.window, fp), xdt)
        x_pad = x_pad.at[:N, :F].set(x.astype(xdt))
        # lane-compact transposed out for narrow F (out_t lesson)
        out_rows = _round_up(F, 8) if (
            F <= 64 and pk.dst_window % 128 == 0 and fp == f_tile) \
            else None
        out = _spmm_pallas_raw(
            x_pad, w_packed,
            dv["local_src"].astype(jnp.int32),
            dv["local_dst"].astype(jnp.int32),
            dv["tile_src_win"], dv["tile_dst_win"], dv["tile_first"],
            window=pk.window, tile=pk.tile,
            n_dst_windows=pk.num_dst_windows, f_tile=f_tile,
            compute_dtype=self.compute_dtype, out_rows=out_rows,
            window_dst=pk.window_dst)
        if out_rows is not None:
            return out[:F, :N].T
        return out[:N, :F]

    def _run(self, which, weights, x):
        return self.apply_packed(self.pack_weights(weights, which), x,
                                 which)

    def pack_weights_host(self, weights, which: str = "fwd"):
        """Host (numpy) variant of :meth:`pack_weights` — routes static
        per-edge weights into the packed (T8, tile) layout without any
        device round-trip (and without needing the perm table on
        device, so it works on ``light`` operators)."""
        pk = self.fwd if which == "fwd" else self.bwd
        w_ext = np.concatenate([np.asarray(weights, np.float32),
                                np.zeros(1, np.float32)])
        T = pk.num_tiles
        T8 = _round_up(T, 8)
        wp = w_ext[pk.perm].reshape(T, pk.tile)
        if T8 != T:
            wp = np.concatenate([wp, np.zeros((T8 - T, pk.tile),
                                              np.float32)])
        return wp

    def bind_external(self, weights):
        """Static-weight SpMM with tables as EXPLICIT arguments.

        Returns ``(fn, consts)``: ``fn(consts, x)`` is differentiable in
        ``x``; pass ``consts`` through your ``jit`` boundary as an
        argument so the multi-hundred-MB tables are device references,
        never constants serialized into the compiled program."""
        consts = {}
        for which in ("fwd", "bwd"):
            d = self._dev[which]
            consts[which] = {
                "local_src": d["local_src"], "local_dst": d["local_dst"],
                "tile_src_win": d["tile_src_win"],
                "tile_dst_win": d["tile_dst_win"],
                "tile_first": d["tile_first"],
                "w": jnp.asarray(self.pack_weights_host(weights, which)),
            }
        geom = SpmmGeom.make(
            self.window, self.tile, self.num_nodes,
            self.fwd.num_src_windows, self.fwd.num_dst_windows,
            self.bwd.num_src_windows, self.bwd.num_dst_windows,
            "bf16" if self.compute_dtype == jnp.bfloat16 else "f32",
            self.window_dst)
        return functools.partial(spmm_static, geom), consts

    def bind(self, weights):
        """Differentiable closure with *static* weights pre-packed for
        both directions — zero per-edge gathers on the train hot path.
        (No gradient w.r.t. the bound weights; use __call__ for that.)"""
        wp_f = self.pack_weights(weights, "fwd")
        wp_b = self.pack_weights(weights, "bwd")

        @jax.custom_vjp
        def f(x):
            return self.apply_packed(wp_f, x, "fwd")

        def f_fwd(x):
            # zero-size dtype carrier (residuals must be jax types)
            return f(x), jnp.zeros((0,), x.dtype)

        def f_bwd(proto, g):
            return (self.apply_packed(
                wp_b, g.astype(jnp.float32), "bwd").astype(proto.dtype),)

        f.defvjp(f_fwd, f_bwd)
        return f

    # --- public -----------------------------------------------------------

    def __call__(self, weights, x):
        return _spmm_apply(self, weights, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_apply(op, weights, x):
    return op._run("fwd", weights, x)


def _spmm_apply_fwd(op, weights, x):
    return op._run("fwd", weights, x), (weights, x)


def _spmm_apply_bwd(op, res, g):
    weights, x = res
    dx = op._run("bwd", weights, g.astype(jnp.float32)).astype(x.dtype)
    dw = jnp.sum(jnp.take(g, op.receivers, axis=0)
                 * jnp.take(x, op.senders, axis=0), axis=-1)
    return dw.astype(weights.dtype), dx


_spmm_apply.defvjp(_spmm_apply_fwd, _spmm_apply_bwd)


# ---------------------------------------------------------------------------
# Explicit-argument static-weight SpMM (for 100M-edge-scale graphs)
# ---------------------------------------------------------------------------
#
# ``SpmmOperator.bind`` closes over the packed tables, so tracing embeds
# them as CONSTANTS in the compiled program — fine at citation scale,
# but a Reddit-scale pack is ~GBs of tables and the remote compiler
# rejects such program bodies (HTTP 413).  ``bind_external`` instead
# returns the tables as a pytree the caller passes through ``jit`` as
# ARGUMENTS (device references, never serialized into the program).

class SpmmGeom(tuple):
    """Hashable static geometry for :func:`spmm_static` (a plain tuple
    subclass so it can ride ``jax.custom_vjp``'s nondiff_argnums)."""

    __slots__ = ()

    @staticmethod
    def make(window, tile, num_nodes, nsw_f, ndw_f, nsw_b, ndw_b,
             compute, window_dst=None):
        return SpmmGeom((window, tile, num_nodes, nsw_f, ndw_f, nsw_b,
                         ndw_b, compute, window_dst))

    window = property(lambda s: s[0])
    tile = property(lambda s: s[1])
    num_nodes = property(lambda s: s[2])
    nsw_f = property(lambda s: s[3])
    ndw_f = property(lambda s: s[4])
    nsw_b = property(lambda s: s[5])
    ndw_b = property(lambda s: s[6])
    compute = property(lambda s: s[7])
    window_dst = property(lambda s: s[8] if len(s) > 8 else None)


def _apply_dir(geom: SpmmGeom, t: dict, x, *, fwd: bool):
    n_src = geom.nsw_f if fwd else geom.nsw_b
    n_dst = geom.ndw_f if fwd else geom.ndw_b
    # asymmetric windows: the bwd direction swaps the (src, dst) pair
    wd_cfg = geom.window_dst
    w_in = geom.window if (fwd or wd_cfg is None) else wd_cfg
    w_out = wd_cfg if (fwd and wd_cfg is not None) else geom.window
    N, F = geom.num_nodes, x.shape[1]
    f_tile = 128 if F > 128 else _round_up(max(F, 1), 128)
    fp = _round_up(F, f_tile)
    cdt = jnp.bfloat16 if geom.compute == "bf16" else jnp.float32
    x_pad = jnp.zeros((n_src * w_in, fp), cdt)
    x_pad = x_pad.at[:N, :F].set(x.astype(cdt))
    out_rows = _round_up(F, 8) if (
        F <= 64 and w_out % 128 == 0 and fp == f_tile) else None
    out = _spmm_pallas_raw(
        x_pad, t["w"],
        t["local_src"].astype(jnp.int32),
        t["local_dst"].astype(jnp.int32),
        t["tile_src_win"], t["tile_dst_win"], t["tile_first"],
        window=w_in, tile=geom.tile, n_dst_windows=n_dst,
        f_tile=f_tile, compute_dtype=cdt, out_rows=out_rows,
        window_dst=None if w_out == w_in else w_out)
    if out_rows is not None:
        return out[:F, :N].T
    return out[:N, :F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_static(geom: SpmmGeom, consts, x):
    """out = A x with static weights; ``consts`` = packed tables pytree
    from :meth:`SpmmOperator.bind_external` (pass through jit as args).
    Differentiable in ``x`` (the bwd is the transposed packed SpMM);
    table cotangents are zeros (DCE'd under jit)."""
    return _apply_dir(geom, consts["fwd"], x, fwd=True)


def _spmm_static_fwd(geom, consts, x):
    return spmm_static(geom, consts, x), consts


def _spmm_static_bwd(geom, consts, g):
    dx = _apply_dir(geom, consts["bwd"], g.astype(jnp.float32),
                    fwd=False)
    return (jax.tree_util.tree_map(jnp.zeros_like, consts), dx)


spmm_static.defvjp(_spmm_static_fwd, _spmm_static_bwd)


# ---------------------------------------------------------------------------
# Bipartite static-weight SpMM (src domain != dst domain)
# ---------------------------------------------------------------------------
#
# The halo-partition remote aggregation (parallel/partition.py) maps the
# (num_peers * halo_size)-row receive buffer onto the S local nodes —
# a rectangular operator.  Same kernel; the geometry just carries both
# domain sizes, and the backward (d recv-buffer) is the transposed pack.

class BiSpmmGeom(tuple):
    """Hashable static geometry for :func:`spmm_bi_static`."""

    __slots__ = ()

    @staticmethod
    def make(window, tile, n_src_nodes, n_dst_nodes, compute,
             window_dst=None):
        wd = window if window_dst is None else int(window_dst)
        return BiSpmmGeom((window, tile, int(n_src_nodes),
                           int(n_dst_nodes),
                           max(_round_up(int(n_src_nodes), window)
                               // window, 1),
                           max(_round_up(int(n_dst_nodes), wd)
                               // wd, 1), compute,
                           window_dst))

    window = property(lambda s: s[0])
    tile = property(lambda s: s[1])
    n_src = property(lambda s: s[2])
    n_dst = property(lambda s: s[3])
    nsw = property(lambda s: s[4])
    ndw = property(lambda s: s[5])
    compute = property(lambda s: s[6])
    window_dst = property(lambda s: s[7] if len(s) > 7 else None)


def pack_bipartite_tables(senders, receivers, n_src, n_dst, weights, *,
                          window=256, tile=256,
                          compute_dtype=jnp.bfloat16,
                          directions=("fwd", "bwd"),
                          window_dst=None):
    """Host-side: build the (geom, consts) pair for
    :func:`spmm_bi_static`.  ``consts['fwd']`` maps src -> dst rows,
    ``consts['bwd']`` the transpose; weights are pre-packed into both
    layouts (static per graph — the GCN-norm case).  Pass
    ``directions=('fwd',)`` for forward-only consumers (no autodiff —
    e.g. the dense-block table builder) to halve the pack cost."""
    w = np.asarray(weights, np.float32)
    wd = window if window_dst is None else int(window_dst)
    consts = {}
    both = (
        ("fwd", (senders, receivers, n_src, n_dst, window, wd)),
        ("bwd", (receivers, senders, n_dst, n_src, wd, window)))
    for which, (s, r, ns, nd, w_in, w_out) in (
            p for p in both if p[0] in directions):
        pk = pack_windows(np.asarray(s), np.asarray(r), ns,
                          window=w_in, tile=tile, num_dst_nodes=nd,
                          window_dst=(None if w_out == w_in
                                      else w_out))
        T8 = _round_up(pk.num_tiles, 8)

        def pad_rows(a):
            if a.shape[0] == T8:
                return a
            pad = np.zeros((T8 - a.shape[0],) + a.shape[1:], a.dtype)
            return np.concatenate([a, pad])

        w_ext = np.concatenate([w, np.zeros(1, np.float32)])
        wp = w_ext[pk.perm].reshape(pk.num_tiles, tile)
        # int16 local indices (values < window <= 32767): halves the
        # dominant H2D table transfer; _bi_apply widens to int32 in-jit
        # before the kernel (~0.1 ms of HBM traffic per call)
        idt = np.int16 if max(window, wd) <= 32767 else np.int32
        consts[which] = {
            "local_src": pad_rows(pk.local_src).astype(idt),
            "local_dst": pad_rows(pk.local_dst).astype(idt),
            "tile_src_win": pk.tile_src_win,
            "tile_dst_win": pk.tile_dst_win,
            "tile_first": pk.tile_first,
            "w": pad_rows(wp),
        }
    geom = BiSpmmGeom.make(window, tile, n_src, n_dst,
                           "bf16" if compute_dtype == jnp.bfloat16
                           else "f32", window_dst)
    return geom, consts


def pad_bi_tables(consts, num_tiles_fwd, num_tiles_bwd):
    """Pad both directions' tile tables to the given tile counts with
    no-op tiles (weight 0, repeating the last real tile's window pair —
    the accumulation run stays consecutive, so padding tiles add zeros
    to an already-initialised output block).  Used to unify shapes
    across shard_map devices."""
    out = {}
    for which, T in (("fwd", num_tiles_fwd), ("bwd", num_tiles_bwd)):
        t = consts[which]
        T8 = _round_up(T, 8)
        T0 = t["tile_src_win"].shape[0]
        if T8 < T0:
            raise ValueError(f"cannot shrink pack {T0} -> {T8}")
        pad_t = T8 - T0
        rows = _round_up(T0, 8)
        out[which] = {
            "local_src": np.concatenate(
                [t["local_src"],
                 np.zeros((T8 - rows, t["local_src"].shape[1]),
                          t["local_src"].dtype)])
            if T8 > rows else t["local_src"],
            "local_dst": np.concatenate(
                [t["local_dst"],
                 np.zeros((T8 - rows, t["local_dst"].shape[1]),
                          t["local_dst"].dtype)])
            if T8 > rows else t["local_dst"],
            "w": np.concatenate(
                [t["w"], np.zeros((T8 - rows, t["w"].shape[1]),
                                  t["w"].dtype)])
            if T8 > rows else t["w"],
            "tile_src_win": np.concatenate(
                [t["tile_src_win"],
                 np.full(pad_t, t["tile_src_win"][-1],
                         t["tile_src_win"].dtype)]),
            "tile_dst_win": np.concatenate(
                [t["tile_dst_win"],
                 np.full(pad_t, t["tile_dst_win"][-1],
                         t["tile_dst_win"].dtype)]),
            "tile_first": np.concatenate(
                [t["tile_first"],
                 np.zeros(pad_t, t["tile_first"].dtype)]),
        }
    return out


def _bi_apply(geom: BiSpmmGeom, t: dict, x, *, fwd: bool):
    n_in = geom.n_src if fwd else geom.n_dst
    n_out = geom.n_dst if fwd else geom.n_src
    nsw = geom.nsw if fwd else geom.ndw
    ndw = geom.ndw if fwd else geom.nsw
    # asymmetric windows: the bwd direction swaps the (src, dst) pair
    wd_cfg = geom.window_dst
    w_in = geom.window if (fwd or wd_cfg is None) else wd_cfg
    w_out = wd_cfg if (fwd and wd_cfg is not None) else geom.window
    F = x.shape[1]
    f_tile = 128 if F > 128 else _round_up(max(F, 1), 128)
    fp = _round_up(F, f_tile)
    cdt = jnp.bfloat16 if geom.compute == "bf16" else jnp.float32
    x_pad = jnp.zeros((nsw * w_in, fp), cdt)
    x_pad = x_pad.at[:n_in, :F].set(x.astype(cdt))
    out_rows = _round_up(F, 8) if (
        F <= 64 and w_out % 128 == 0 and fp == f_tile) else None
    out = _spmm_pallas_raw(
        x_pad, t["w"],
        t["local_src"].astype(jnp.int32),
        t["local_dst"].astype(jnp.int32),
        t["tile_src_win"], t["tile_dst_win"], t["tile_first"],
        window=w_in, tile=geom.tile, n_dst_windows=ndw,
        f_tile=f_tile, compute_dtype=cdt, out_rows=out_rows,
        window_dst=None if w_out == w_in else w_out)
    if out_rows is not None:
        return out[:F, :n_out].T
    return out[:n_out, :F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_bi_static(geom: BiSpmmGeom, consts, x):
    """out[(n_dst, F)] = A x[(n_src, F)] with static weights; tables
    pass through jit as arguments.  Differentiable in x."""
    return _bi_apply(geom, consts["fwd"], x, fwd=True)


def _spmm_bi_fwd(geom, consts, x):
    # zero-size residual carries the primal dtype (a bare np.dtype is
    # not a JAX type)
    return spmm_bi_static(geom, consts, x), \
        (consts, jnp.zeros((0,), x.dtype))


def _spmm_bi_bwd(geom, res, g):
    consts, x_proto = res
    dx = _bi_apply(geom, consts["bwd"], g.astype(jnp.float32),
                   fwd=False)
    # the cotangent must match the primal dtype (bf16 halo rows cross
    # the collective at bf16 in both directions)
    return (jax.tree_util.tree_map(jnp.zeros_like, consts),
            dx.astype(x_proto.dtype))


spmm_bi_static.defvjp(_spmm_bi_fwd, _spmm_bi_bwd)
