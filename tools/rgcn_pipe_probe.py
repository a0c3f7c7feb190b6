"""Probe: software-pipelined one-hot builds in the packed RGCN fwd
kernel (round 5, VERDICT item 6).

Hypothesis: the per-tile serial chain (build g1/gd -> gather dot ->
expand -> combine -> scatter -> accumulate) leaves the MXU idle during
the two VPU one-hot builds (~1.1 us at (768, 192)) and the VPU idle
during the dots.  Building tile t+1's one-hots into double-buffered
VMEM scratch while tile t's dots execute breaks the dependency, letting
the scheduler overlap the units.

Variants timed (forward only, out_t orientation, K-scanned):
  stock  — the production _fwd_kernel (in-step builds)
  pipe   — double-buffered next-step builds in scratch
Parity is asserted between the two before timing.
"""

import argparse
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench_common as bc  # noqa: E402
from pytorch_geometric_tpu.ops.kernel_util import (  # noqa: E402
    edge_onehot,
    iota_rows,
)
from pytorch_geometric_tpu.ops.packed_rgcn import (  # noqa: E402
    PackedRgcnSpmm,
    _expand_mats,
    _fwd_kernel,
    _round_up,
)


def pipe_fwd_kernel(gw_ref, dw_ref, first_ref,
                    xb_ref, att_ref, lsrc_ref, ldst_ref,
                    lsrcN_ref, ldstN_ref, rel_ref, w_ref,
                    cols_ref, out_ref, g1a, gda, g1b, gdb,
                    *, B, C, Rp, tile, window, T, order):
    t = pl.program_id(0)
    row = t % 8
    rel = rel_ref[row, :]
    w = w_ref[row, :]

    @pl.when(t == 0)
    def _():
        g1a[...] = edge_onehot(lsrc_ref[0, :], cols_ref, tile, window)
        gda[...] = edge_onehot(ldst_ref[0, :], cols_ref, tile, window)

    even = (t % 2) == 0
    g1 = jnp.where(even, g1a[...], g1b[...])
    gd = jnp.where(even, gda[...], gdb[...])

    def build_next():
        nrow = (t + 1) % 8
        ls = lsrcN_ref[nrow, :]
        ld = ldstN_ref[nrow, :]
        nxt = t + 1 < T

        @pl.when(jnp.logical_and(even, nxt))
        def _():
            g1b[...] = edge_onehot(ls, cols_ref, tile, window)
            gdb[...] = edge_onehot(ld, cols_ref, tile, window)

        @pl.when(jnp.logical_and(jnp.logical_not(even), nxt))
        def _():
            g1a[...] = edge_onehot(ls, cols_ref, tile, window)
            gda[...] = edge_onehot(ld, cols_ref, tile, window)

    if order == "early":
        build_next()

    rcols = jax.lax.broadcasted_iota(jnp.int32, (tile, Rp), 1)
    grel = jnp.where(rel[:, None] == rcols, w[:, None], 0.0) \
        .astype(jnp.bfloat16)
    rep, tilec = _expand_mats(B, C, out_t=True)

    xbe = jax.lax.dot(g1, xb_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    ae_wide = jax.lax.dot(
        jax.lax.dot(grel, att_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(
                        jnp.bfloat16),
        rep, preferred_element_type=jnp.float32)
    prod = ae_wide * xbe
    msg = jax.lax.dot(prod.astype(jnp.bfloat16), tilec.T,
                      preferred_element_type=jnp.float32)
    if order == "mid":
        build_next()
    contrib = jax.lax.dot_general(
        msg.astype(jnp.bfloat16), gd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = contrib

    @pl.when(first_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def build_fwd(op, B, C, variant, order="mid"):
    W, tile, Rp = op.window, op.tile, op.Rp
    nw = op.fwd_pack.num_src_windows
    npad = nw * W
    BC = B * C
    C8 = _round_up(C, 8)
    cols = iota_rows(W)
    pk = op.fwd_pack
    T = pk.num_tiles
    n_blk = (_round_up(T, 8)) // 8

    in_specs = [
        pl.BlockSpec((W, BC), lambda t, gw, dw, f: (gw[t], 0)),
        pl.BlockSpec((Rp, B), lambda t, gw, dw, f: (0, 0)),
        pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0)),  # lsrc
        pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0)),  # ldst
    ]
    scratch = []
    if variant == "pipe":
        # the same id arrays again, one block AHEAD (clamped)
        in_specs += [
            pl.BlockSpec((8, tile),
                         lambda t, *_: (jnp.minimum((t + 1) // 8,
                                                    n_blk - 1), 0)),
            pl.BlockSpec((8, tile),
                         lambda t, *_: (jnp.minimum((t + 1) // 8,
                                                    n_blk - 1), 0)),
        ]
        scratch = [pltpu.VMEM((tile, W), jnp.bfloat16)] * 4
    in_specs += [
        pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0)),  # rel
        pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0)),  # w
        pl.BlockSpec((8, W), lambda t, *_: (0, 0)),          # cols
    ]
    out_spec = pl.BlockSpec((C8, W), lambda t, gw, dw, f: (0, dw[t]))
    out_shape = jax.ShapeDtypeStruct((C8, npad), jnp.float32)
    if variant == "pipe":
        kernel = functools.partial(pipe_fwd_kernel, B=B, C=C, Rp=Rp,
                                   tile=tile, window=W, T=T,
                                   order=order)
    else:
        kernel = functools.partial(_fwd_kernel, B=B, C=C, Rp=Rp,
                                   tile=tile, window=W, stream=False,
                                   out_t=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(T,), in_specs=in_specs,
        out_specs=out_spec, scratch_shapes=scratch)
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    dv = op._dev["fwd"]

    def run_once(xp, ap):
        args = [dv["send_win"], dv["recv_win"], dv["first"], xp, ap,
                dv["lsend"], dv["lrecv"]]
        if variant == "pipe":
            args += [dv["lsend"], dv["lrecv"]]
        args += [dv["rel"], dv["w"], cols]
        return call(*args)

    return run_once, npad, T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="768x192")
    ap.add_argument("--K", type=int, default=200)
    ap.add_argument("--shapes", default="30x16,30x2")
    ap.add_argument("--orders", default="mid,early")
    args = ap.parse_args()
    w, t = map(int, args.geom.split("x"))

    from tools.rgcn_sweep import build_graph
    graph, data = build_graph()
    et = np.asarray(graph.extras["edge_type"])
    N = graph.num_nodes
    ei = np.asarray(graph.edge_index)
    norm = np.ones(ei.shape[1], np.float32)
    op = PackedRgcnSpmm(ei[0], ei[1], et, 46, N, norm, window=w,
                        tile=t)
    key = jax.random.PRNGKey(0)

    for shape in args.shapes.split(","):
        B, C = map(int, shape.split("x"))
        run_s, npad, T = build_fwd(op, B, C, "stock")
        xp = jax.random.normal(key, (npad, B * C), jnp.bfloat16) * 0.1
        ap_ = jax.random.normal(key, (op.Rp, B), jnp.bfloat16) * 0.1
        ref = np.asarray(run_s(xp, ap_))

        variants = [("stock", run_s)]
        for order in args.orders.split(","):
            run_p, _, _ = build_fwd(op, B, C, "pipe", order)
            out = np.asarray(run_p(xp, ap_))
            err = np.abs(out - ref).max() / (1 + np.abs(ref).max())
            assert err < 1e-5, f"pipe({order}) mismatch: {err}"
            variants.append((f"pipe_{order}", run_p))

        for name, fn in variants:
            def body(c, i):
                x, a = c
                o = fn(x, a)
                return (jnp.maximum(
                    x, o[:1, :x.shape[1]].astype(jnp.bfloat16)
                    * 1e-30 + i * 1e-30), a), None

            @jax.jit
            def run(x, a):
                (x, a), _ = jax.lax.scan(
                    body, (x, a),
                    jnp.arange(args.K, dtype=jnp.bfloat16))
                return jnp.sum(x)

            secs, _ = bc.time_program(run, xp, ap_, iters=2)
            per = secs / args.K
            print(f"B={B} C={C} {name}: {per * 1e3:.3f} ms/pass "
                  f"({per / T * 1e6:.3f} us/tile, T={T})", flush=True)


if __name__ == "__main__":
    main()
