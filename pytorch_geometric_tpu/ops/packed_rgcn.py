"""Packed-edge fused RGCN aggregation (Pallas, TPU) — O(E) MXU work.

Reference semantics: ``torch_geometric.nn.RGCNConv`` with basis
decomposition (reference examples/rgcn.py:18-25): per edge e
(src -> recv, relation et, static mean-norm w),

    out[i] = sum_{e -> i} w_e * sum_b att[et_e, b] * xB[src_e, b, :]

The XLA formulation (ops/embed_spmm.RgcnBasisSpmm) pays ~3 ms per
E-row gather from an HBM-resident table on v5e (~20 ns/row, width-
independent), and a full-graph MUTAG epoch needs ~8 of them.  Here the
edges are packed host-side into (src-window, dst-window) buckets
(ops/pack.py) and every gather/scatter is a ONE-HOT MATMUL on the MXU,
like ops/packed_gat.py:

- forward: one kernel per layer — gather xB rows (src one-hot),
  gather att rows (relation one-hot against the tiny (R, B) table in
  VMEM), contract over bases on the VPU, scatter to receivers.
- backward: one kernel over the src-major pack — d(xB) scattered to
  sender windows; d(att) accumulated in a full (R, B) VMEM block
  across all tiles (it is tiny).

The caller should RCM-relabel the graph first (utils/reorder.py) so
buckets are dense: MUTAG-RDF packs to 1.57x edge inflation at
window=1024, tile=256.
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


def _expand_mats(B, C, out_t=False):
    """Static one-hot layout matrices so per-basis broadcast/reduce run
    on the MXU instead of B unrolled 12.5%-lane VPU ops:

    rep  (B, B*C):   rep[b, b*C + c] = 1     (ae -> ae per column)
    tilec (Cs, B*C): tilec[c, b*C + c] = 1   (ge -> ge per basis)
    sumb (B*C, C):   rep^T pattern           (reduce over bases)
    sumc (B*C, B):   tilec^T pattern         (reduce over channels)

    ``out_t=True`` pads tilec's channel rows to a multiple of 8 (zero
    rows beyond C) so the transposed (C8, window) accumulator block has
    a legal sublane count.
    """
    bc = B * C
    Cs = _round_up(C, 8) if out_t else C
    b_of = jax.lax.broadcasted_iota(jnp.int32, (B, bc), 1) // C
    rep = (jax.lax.broadcasted_iota(jnp.int32, (B, bc), 0)
           == b_of).astype(jnp.bfloat16)
    c_of = jax.lax.broadcasted_iota(jnp.int32, (Cs, bc), 1) % C
    tilec = (jax.lax.broadcasted_iota(jnp.int32, (Cs, bc), 0)
             == c_of).astype(jnp.bfloat16)
    return rep, tilec


def _fwd_kernel(gw_ref, dw_ref, first_ref,
                xb_ref, att_ref, lsrc_ref, ldst_ref, rel_ref, w_ref,
                cols_ref, *rest, B, C, Rp, tile, window, stream=False,
                out_t=False):
    if stream:
        g1s_ref, gds_ref, out_ref = rest
    else:
        (out_ref,) = rest
    t = pl.program_id(0)
    row = t % 8
    lsrc = lsrc_ref[row, :]
    ldst = ldst_ref[row, :]
    rel = rel_ref[row, :]
    w = w_ref[row, :]
    if stream:
        g1 = g1s_ref[:].astype(jnp.bfloat16)
        gd = gds_ref[:].astype(jnp.bfloat16)
    else:
        g1 = edge_onehot(lsrc, cols_ref, tile, window)
        gd = edge_onehot(ldst, cols_ref, tile, window)
    rcols = jax.lax.broadcasted_iota(jnp.int32, (tile, Rp), 1)
    # fold the edge weight into the SMALL (tile, Rp) relation one-hot
    # instead of a third (tile, B*C) VPU pass over the wide product
    grel = jnp.where(rel[:, None] == rcols, w[:, None], 0.0) \
        .astype(jnp.bfloat16)
    rep, tilec = _expand_mats(B, C, out_t=out_t)

    xbe = jax.lax.dot(g1, xb_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)  # (tile, B*C)
    # w*ae expanded to (tile, B*C) in one fused MXU chain:
    # (w-folded grel) @ att @ rep
    ae_wide = jax.lax.dot(
        jax.lax.dot(grel, att_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(
                        jnp.bfloat16),
        rep, preferred_element_type=jnp.float32)           # (tile, B*C)
    prod = ae_wide * xbe
    msg = jax.lax.dot(prod.astype(jnp.bfloat16), tilec.T,
                      preferred_element_type=jnp.float32)  # (tile, Cs)
    if out_t:
        # TRANSPOSED accumulator: the (window, C<=128) out block pads
        # its minor dim to 128 lanes (768x128 f32 = 393 KB of VMEM
        # read-modify-write per tile — rivals the gather dot); the
        # (C8, window) orientation is lane-compact (49 KB at C=16).
        # Same contraction, operands swapped — free in-kernel (the
        # GAT dd-compact lesson, ops/packed_gat.py round 3).
        contrib = jax.lax.dot_general(
            msg.astype(jnp.bfloat16), gd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (C8, window)
    else:
        contrib = jax.lax.dot_general(
            gd, msg.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (window, C)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = contrib

    @pl.when(first_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _bwd_kernel(gw_ref, dw_ref, first_ref,
                xb_ref, att_ref, g_ref, lsend_ref, lrecv_ref, rel_ref,
                w_ref, cols_ref, *rest, B, C, Rp, tile, window,
                stream=False, out_t=False):
    """Runs over the SRC-major pack: gw = sender windows (gather xB,
    scatter dxB), dw = receiver windows (gather g)."""
    if stream:
        gss_ref, grs_ref, dxb_ref, datt_ref = rest
    else:
        dxb_ref, datt_ref = rest
    t = pl.program_id(0)
    row = t % 8
    lsend = lsend_ref[row, :]
    lrecv = lrecv_ref[row, :]
    rel = rel_ref[row, :]
    w = w_ref[row, :]
    if stream:
        gs = gss_ref[:].astype(jnp.bfloat16)
        gr = grs_ref[:].astype(jnp.bfloat16)
    else:
        gs = edge_onehot(lsend, cols_ref, tile, window)
        gr = edge_onehot(lrecv, cols_ref, tile, window)
    rcols = jax.lax.broadcasted_iota(jnp.int32, (tile, Rp), 1)
    grel = (rel[:, None] == rcols).astype(jnp.bfloat16)

    rep, tilec = _expand_mats(B, C)
    ge = jax.lax.dot(gr, g_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)   # (tile, C)
    ge = ge * w[:, None]
    xbe = jax.lax.dot(gs, xb_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)  # (tile, B*C)
    ae_wide = jax.lax.dot(
        jax.lax.dot(grel, att_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(
                        jnp.bfloat16),
        rep, preferred_element_type=jnp.float32)           # (tile, B*C)
    ge_wide = jax.lax.dot(ge.astype(jnp.bfloat16), tilec,
                          preferred_element_type=jnp.float32)
    dxbe = ae_wide * ge_wide                               # (tile, B*C)
    dae = jax.lax.dot((xbe * ge_wide).astype(jnp.bfloat16), rep.T,
                      preferred_element_type=jnp.float32)  # (tile, B)

    # scatter by sender = the gather one-hot contracted on its
    # tile axis (no second (tile, window) one-hot build)
    if out_t:
        # lane-compact transposed accumulator (see _fwd_kernel): at
        # conv2's BC=60 the (window, BC) block pads 60 -> 128 lanes
        bc = B * C
        BC8 = _round_up(bc, 8)
        dx = dxbe
        if BC8 > bc:
            dx = jnp.concatenate(
                [dx, jnp.zeros((tile, BC8 - bc), dx.dtype)], axis=1)
        contrib_x = jax.lax.dot_general(
            dx.astype(jnp.bfloat16), gs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (BC8, window)
    else:
        contrib_x = jax.lax.dot_general(
            gs, dxbe.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (window, BC)
    # relation scatter: transposed-contract the relation one-hot
    contrib_a = jax.lax.dot_general(
        grel, dae.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (Rp, B)

    @pl.when(first_ref[t] == 1)
    def _():
        dxb_ref[:] = contrib_x

    @pl.when(first_ref[t] == 0)
    def _():
        dxb_ref[:] = dxb_ref[:] + contrib_x

    @pl.when(t == 0)
    def _():
        datt_ref[:] = jnp.zeros_like(datt_ref)

    datt_ref[:] = datt_ref[:] + contrib_a


class PackedRgcnSpmm:
    """Relational basis aggregation over packed edge tiles.

    Call contract mirrors RgcnBasisSpmm::

        op = PackedRgcnSpmm(senders, receivers, edge_type, R, N, norm)
        out = op(xB2d, att)     # xB2d (num_src_rows, B*C), att (R, B)
    """

    def __init__(self, senders, receivers, edge_type,
                 num_relations: int, num_nodes: int, weights,
                 num_src_rows: int = None, window: int = 1024,
                 tile: int = 256, interpret: bool = None,
                 onehot: str = "build", out_t: bool = True):
        s = np.asarray(senders, dtype=np.int64)
        r = np.asarray(receivers, dtype=np.int64)
        et = np.asarray(edge_type, dtype=np.int64)
        w = np.asarray(weights, np.float32)
        self.num_nodes = int(num_nodes)
        self.num_src_rows = int(num_src_rows if num_src_rows is not None
                                else num_nodes)
        self.R = int(num_relations)
        self.Rp = _round_up(self.R, 8)
        self.window, self.tile = window, tile
        NP = max(self.num_nodes, self.num_src_rows)
        self.NP = NP
        s = np.clip(s, 0, self.num_src_rows - 1)
        self.E = len(s)
        self.fwd_pack = pack_windows(s, r, NP, window=window, tile=tile)
        self.bwd_pack = pack_windows(r, s, NP, window=window, tile=tile)
        self.inflation = self.fwd_pack.flop_inflation
        self.num_tiles = self.fwd_pack.num_tiles

        def slot_arrays(pk, swap):
            T8 = _round_up(pk.num_tiles, 8)

            def pad_tiles(a, fill=0):
                out = np.full((T8, a.shape[1]), fill, a.dtype)
                out[: a.shape[0]] = a
                return out

            perm = pk.perm.astype(np.int64).reshape(pk.num_tiles,
                                                    pk.tile)
            valid = perm < self.E
            pe = np.where(valid, perm, 0)
            relp = np.where(valid, et[pe], 0).astype(np.int32)
            wp = np.where(valid, w[pe], 0.0).astype(np.float32)
            return dict(
                lsend=jnp.asarray(pad_tiles(
                    pk.local_dst if swap else pk.local_src)),
                lrecv=jnp.asarray(pad_tiles(
                    pk.local_src if swap else pk.local_dst)),
                rel=jnp.asarray(pad_tiles(relp)),
                w=jnp.asarray(pad_tiles(wp)),
                send_win=jnp.asarray(pk.tile_dst_win if swap
                                     else pk.tile_src_win),
                recv_win=jnp.asarray(pk.tile_src_win if swap
                                     else pk.tile_dst_win),
                first=jnp.asarray(pk.tile_first),
            )

        self._dev = {"fwd": slot_arrays(self.fwd_pack, False),
                     "bwd": slot_arrays(self.bwd_pack, True)}
        assert onehot in ("build", "stream_int8", "stream_bf16")
        self.onehot = onehot
        # transposed accumulator needs a 128-multiple lane dim
        self.out_t = bool(out_t) and window % 128 == 0
        self._interpret = (jax.default_backend() != "tpu"
                           if interpret is None else interpret)
        self._cache = {}

    def _build(self, B: int, C: int):
        W, tile, Rp = self.window, self.tile, self.Rp
        NP, E = self.NP, self.E
        nw = self.fwd_pack.num_src_windows
        npad = nw * W
        n, ns = self.num_nodes, self.num_src_rows
        stream = self.onehot != "build"
        out_t = self.out_t
        C8 = _round_up(C, 8)
        kw = dict(B=B, C=C, Rp=Rp, tile=tile, window=W, stream=stream)
        cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
        BC = B * C
        cols = iota_rows(W)

        def build_call(pk, kernel, extra_g, out_specs, out_shapes):
            T = pk.num_tiles
            in_specs = [
                pl.BlockSpec((W, BC),
                             lambda t, gw, dw, f: (gw[t], 0)),   # xB
                pl.BlockSpec((Rp, B), lambda t, gw, dw, f: (0, 0)),
            ]
            if extra_g:
                in_specs.append(pl.BlockSpec(
                    (W, C), lambda t, gw, dw, f: (dw[t], 0)))    # g
            in_specs += [pl.BlockSpec((8, tile), lambda t, *_:
                                      (t // 8, 0))] * 4
            in_specs.append(pl.BlockSpec((8, W),
                                         lambda t, *_: (0, 0)))
            if stream:
                in_specs += [pl.BlockSpec((tile, W),
                                          lambda t, *_: (t, 0))] * 2
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3, grid=(T,), in_specs=in_specs,
                out_specs=out_specs)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shapes,
                interpret=self._interpret, compiler_params=cp)

        if out_t:
            fwd_out_spec = pl.BlockSpec(
                (C8, W), lambda t, gw, dw, f: (0, dw[t]))
            fwd_out_shape = jax.ShapeDtypeStruct((C8, npad),
                                                 jnp.float32)
        else:
            fwd_out_spec = pl.BlockSpec(
                (W, C), lambda t, gw, dw, f: (dw[t], 0))
            fwd_out_shape = jax.ShapeDtypeStruct((npad, C),
                                                 jnp.float32)
        fwd_call = build_call(
            self.fwd_pack,
            functools.partial(_fwd_kernel, out_t=out_t, **kw),
            False, fwd_out_spec, fwd_out_shape)
        BC8 = _round_up(BC, 8)
        if out_t:
            dxb_spec = pl.BlockSpec((BC8, W),
                                    lambda t, gw, dw, f: (0, gw[t]))
            dxb_shape = jax.ShapeDtypeStruct((BC8, npad), jnp.float32)
        else:
            dxb_spec = pl.BlockSpec((W, BC),
                                    lambda t, gw, dw, f: (gw[t], 0))
            dxb_shape = jax.ShapeDtypeStruct((npad, BC), jnp.float32)
        bwd_call = build_call(
            self.bwd_pack,
            functools.partial(_bwd_kernel, out_t=out_t, **kw),
            True,
            [dxb_spec,
             pl.BlockSpec((Rp, B), lambda t, gw, dw, f: (0, 0))],
            [dxb_shape,
             jax.ShapeDtypeStruct((Rp, B), jnp.float32)])
        dv_f, dv_b = self._dev["fwd"], self._dev["bwd"]
        if stream:
            from pytorch_geometric_tpu.ops.kernel_util import (
                onehot_blocks)
            bdt = (jnp.int8 if self.onehot == "stream_int8"
                   else jnp.bfloat16)

            # traced lazily per call (NOT materialised at build): a
            # concrete multi-hundred-MB block table closed over a jit
            # is serialized into the remote-compile payload; the traced
            # build is hoisted out of the caller's epoch scan by XLA
            # loop-invariant code motion
            def blk(dv):
                return (onehot_blocks(dv["lsend"], tile, W, bdt),
                        onehot_blocks(dv["lrecv"], tile, W, bdt))
        else:
            def blk(dv):
                return ()

        def pad_rows(x, rows):
            return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))

        @jax.custom_vjp
        def f(xB2d, att):
            out, _ = _fwd(xB2d, att)
            return out

        def _fwd(xB2d, att):
            # bf16 inputs: halves the per-tile window DMA traffic (the
            # MXU consumed bf16 anyway; accumulation stays fp32)
            xp = pad_rows(xB2d, npad).astype(jnp.bfloat16)
            ap = pad_rows(att, Rp).astype(jnp.bfloat16)
            out = fwd_call(dv_f["send_win"], dv_f["recv_win"],
                           dv_f["first"], xp, ap, dv_f["lsend"],
                           dv_f["lrecv"], dv_f["rel"], dv_f["w"],
                           cols, *blk(dv_f))
            if out_t:
                # lane-compact (C8, npad) kernel output; the consumer-
                # facing (n, C) orientation is one XLA transpose of a
                # ~MB-scale array (vs ~0.7 us/tile of block RMW saved)
                return out[:C, :n].T, (xp, ap)
            return out[:n], (xp, ap)

        R = self.R

        def _bwd(res, g):
            xp, ap = res
            gp = pad_rows(g, npad).astype(jnp.bfloat16)
            dxb, datt = bwd_call(dv_b["send_win"], dv_b["recv_win"],
                                 dv_b["first"], xp, ap, gp,
                                 dv_b["lsend"], dv_b["lrecv"],
                                 dv_b["rel"], dv_b["w"], cols, *blk(dv_b))
            if out_t:
                dxb = dxb[:B * C, :ns].T
                return dxb, datt[:R]
            return dxb[:ns], datt[:R]

        f.defvjp(_fwd, _bwd)
        return f

    def __call__(self, xB2d, att):
        B = att.shape[1]
        C = xB2d.shape[1] // B
        key = (B, C)
        if key not in self._cache:
            self._cache[key] = self._build(B, C)
        return self._cache[key](xB2d, att)
