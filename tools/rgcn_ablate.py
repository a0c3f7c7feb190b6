"""Ablate the packed RGCN backward kernel term by term on TPU.

Times kernel variants with individual cost terms removed, to locate
where the ~3.1 us/tile backward budget actually goes (one-hot builds,
gather dots, scatter dots, the wide fp32 block accumulation).  Each
variant is numerically wrong on purpose; only wall-clock matters.
"""

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_common as bc
from pytorch_geometric_tpu.ops.kernel_util import edge_onehot, iota_rows
from pytorch_geometric_tpu.ops.packed_rgcn import (
    PackedRgcnSpmm, _expand_mats, _round_up)


def make_bwd_kernel(mode, B, C, Rp, tile, window):
    def kernel(gw_ref, dw_ref, first_ref,
               xb_ref, att_ref, g_ref, lsend_ref, lrecv_ref, rel_ref,
               w_ref, cols_ref, dxb_ref, datt_ref):
        t = pl.program_id(0)
        row = t % 8
        lsend = lsend_ref[row, :]
        lrecv = lrecv_ref[row, :]
        rel = rel_ref[row, :]
        w = w_ref[row, :]
        if mode == "noonehot":
            gs = jnp.full((tile, window), 0.001, jnp.bfloat16)
            gr = gs
        else:
            gs = edge_onehot(lsend, cols_ref, tile, window)
            gr = edge_onehot(lrecv, cols_ref, tile, window)
        rcols = jax.lax.broadcasted_iota(jnp.int32, (tile, Rp), 1)
        grel = (rel[:, None] == rcols).astype(jnp.bfloat16)

        rep, tilec = _expand_mats(B, C)
        ge = jax.lax.dot(gr, g_ref[:].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        ge = ge * w[:, None]
        if mode == "noxbgather":
            xbe = jnp.full((tile, B * C), 0.001, jnp.float32)
        else:
            xbe = jax.lax.dot(gs, xb_ref[:].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        ae_wide = jax.lax.dot(
            jax.lax.dot(grel, att_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32).astype(
                            jnp.bfloat16),
            rep, preferred_element_type=jnp.float32)
        ge_wide = jax.lax.dot(ge.astype(jnp.bfloat16), tilec,
                              preferred_element_type=jnp.float32)
        dxbe = ae_wide * ge_wide
        dae = jax.lax.dot((xbe * ge_wide).astype(jnp.bfloat16), rep.T,
                          preferred_element_type=jnp.float32)

        if mode == "noscatter":
            contrib_x = jnp.zeros((window, B * C), jnp.float32)
        else:
            contrib_x = jax.lax.dot_general(
                gs, dxbe.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        contrib_a = jax.lax.dot_general(
            grel, dae.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        if mode == "noaccum":
            dxb_ref[:] = contrib_x
        else:
            @pl.when(first_ref[t] == 1)
            def _():
                dxb_ref[:] = contrib_x

            @pl.when(first_ref[t] == 0)
            def _():
                dxb_ref[:] = dxb_ref[:] + contrib_x

        @pl.when(t == 0)
        def _():
            datt_ref[:] = jnp.zeros_like(datt_ref)

        if mode != "nodatt":
            datt_ref[:] = datt_ref[:] + contrib_a

    return kernel


def build_bwd_call(op, mode, B, C):
    W, tile, Rp = op.window, op.tile, op.Rp
    nw = op.fwd_pack.num_src_windows
    npad = nw * W
    BC = B * C
    cols = iota_rows(W)
    kernel = make_bwd_kernel(mode, B, C, Rp, tile, W)
    pk = op.bwd_pack
    T = pk.num_tiles
    in_specs = [
        pl.BlockSpec((W, BC), lambda t, gw, dw, f: (gw[t], 0)),
        pl.BlockSpec((Rp, B), lambda t, gw, dw, f: (0, 0)),
        pl.BlockSpec((W, C), lambda t, gw, dw, f: (dw[t], 0)),
    ]
    in_specs += [pl.BlockSpec((8, tile), lambda t, *_: (t // 8, 0))] * 4
    in_specs.append(pl.BlockSpec((8, W), lambda t, *_: (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(T,), in_specs=in_specs,
        out_specs=[pl.BlockSpec((W, BC), lambda t, gw, dw, f: (gw[t], 0)),
                   pl.BlockSpec((Rp, B), lambda t, gw, dw, f: (0, 0))])
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((npad, BC), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024))
    dv = op._dev["bwd"]

    def run_once(xp, ap, gp):
        return call(dv["send_win"], dv["recv_win"], dv["first"],
                    xp, ap, gp, dv["lsend"], dv["lrecv"], dv["rel"],
                    dv["w"], cols)

    return run_once, npad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="768x192")
    ap.add_argument("--K", type=int, default=200)
    ap.add_argument("--modes", default="full,noaccum,noonehot,"
                    "noxbgather,noscatter,nodatt")
    args = ap.parse_args()
    w, t = map(int, args.geom.split("x"))

    from tools.rgcn_sweep import build_graph
    graph, data = build_graph()
    et = np.asarray(graph.extras["edge_type"])
    N = graph.num_nodes
    B, C = 30, 16
    ei = np.asarray(graph.edge_index)
    norm = np.ones(ei.shape[1], np.float32)
    op = PackedRgcnSpmm(ei[0], ei[1], et, 46, N, norm,
                        window=w, tile=t)
    key = jax.random.PRNGKey(0)
    nw = op.fwd_pack.num_src_windows

    for mode in args.modes.split(","):
        run_once, npad = build_bwd_call(op, mode, B, C)
        xp = jax.random.normal(key, (npad, B * C), jnp.bfloat16) * 0.1
        ap_ = jax.random.normal(key, (op.Rp, B), jnp.bfloat16) * 0.1
        gp = jax.random.normal(key, (npad, C), jnp.bfloat16) * 0.1

        def body(c, i):
            x, a, g = c
            dxb, datt = run_once(x, a, g)
            return (jnp.maximum(x, dxb.astype(jnp.bfloat16) * 1e-30
                                + i * 1e-30), a, g), None

        @jax.jit
        def run(x, a, g):
            (x, a, g), _ = jax.lax.scan(
                body, (x, a, g), jnp.arange(args.K, dtype=jnp.bfloat16))
            return jnp.sum(x)

        secs, _ = bc.time_program(run, xp, ap_, gp)
        per = secs / args.K
        print(f"{mode:12s}: {per*1e3:.3f} ms "
              f"({per/op.bwd_pack.num_tiles*1e9:.0f} ns/tile, "
              f"T={op.bwd_pack.num_tiles})", flush=True)


if __name__ == "__main__":
    main()
