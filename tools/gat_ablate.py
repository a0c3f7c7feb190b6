"""Ablate the merged GAT backward kernel term by term on TPU.

Each variant removes one cost term (numerically wrong on purpose);
wall-clock deltas locate the per-tile budget. Mirrors rgcn_ablate.py.
"""

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import bench_common as bc  # noqa: E402
from pytorch_geometric_tpu.ops.kernel_util import (  # noqa: E402
    edge_onehot, iota_rows)
from pytorch_geometric_tpu.ops.packed_gat import (  # noqa: E402
    PackedFlashGat, _head_expand, _keep_mask)


def make_kernel(mode, H, C, rate, slope, tile, window):
    def kernel(gw_ref, dw_ref, first_ref, seed_ref,
               sh_ref, d_ref, m_ref, g_ref, lsrc_ref, ldst_ref,
               eid_ref, cols_ref, out_ref, ddf_ref):
        t = pl.program_id(0)
        scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
        thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)
        row = t % 8
        lsrc = lsrc_ref[row, :]
        ldst = ldst_ref[row, :]
        eid2d = eid_ref[row, :][:, None]
        if mode == "noonehot":
            g1 = jnp.full((tile, window), 0.001, jnp.bfloat16)
            gd = g1
        else:
            g1 = edge_onehot(lsrc, cols_ref, tile, window)
            gd = edge_onehot(ldst, cols_ref, tile, window)
        em = (eid2d >= 0).astype(jnp.float32)

        if mode == "nogather_sh":
            sh = jnp.full((tile, H + H * C), 0.001, jnp.float32)
        else:
            sh = jax.lax.dot(g1, sh_ref[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
        a_s, m_e = sh[:, :H], sh[:, H:]
        if mode == "nogather_dg":
            dg = jnp.full((tile, H + H * C + H), 0.001, jnp.float32)
        elif mode == "noconcat":
            dg = jax.lax.dot(gd, d_ref[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            dg = jnp.concatenate(
                [dg, jnp.full((tile, H * C + H), 0.001, jnp.float32)],
                axis=1)
        else:
            dg = jax.lax.dot(gd, jnp.concatenate(
                [d_ref[:], g_ref[:]], axis=1).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        a_d = dg[:, :H]
        gnum = dg[:, H:H + H * C]
        gden = dg[:, H + H * C:]

        zpre = a_s + a_d
        z = jnp.where(zpre > 0, zpre, slope * zpre) - m_ref[0:1, :]
        if mode == "noexp":
            expv = z * em
        else:
            expv = jnp.exp(z) * em

        expand = _head_expand(H, C)
        prod = gnum * m_e
        if mode == "nosplit":
            dot = jax.lax.dot(prod.astype(jnp.bfloat16), expand.T,
                              preferred_element_type=jnp.float32)
        else:
            p_hi = prod.astype(jnp.bfloat16)
            p_lo = (prod - p_hi.astype(jnp.float32)).astype(
                jnp.bfloat16)
            dot = (jax.lax.dot(p_hi, expand.T,
                               preferred_element_type=jnp.float32)
                   + jax.lax.dot(p_lo, expand.T,
                                 preferred_element_type=jnp.float32))
        if rate > 0 and mode != "nodrop":
            keep = _keep_mask(seed_ref[0], eid2d, tile, H, thresh)
            dexp = keep * scale * dot + gden
            w = expv * keep * scale
        else:
            dexp = dot + gden
            w = expv
        dz = expv * dexp
        dz = jnp.where(zpre > 0, dz, slope * dz)
        w_wide = jax.lax.dot(w.astype(jnp.bfloat16), expand,
                             preferred_element_type=jnp.float32)
        payload = jnp.concatenate([dz, gnum * w_wide], axis=1)
        if mode == "noscatter":
            contrib = jnp.zeros((window, H + H * C), jnp.float32)
        elif mode in ("tscatter", "tscatter_all"):
            wio = jax.lax.broadcasted_iota(jnp.int32, (window, tile), 0)
            g1t = (wio == lsrc[None, :]).astype(jnp.bfloat16)
            contrib = jax.lax.dot(g1t, payload.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
        else:
            contrib = jax.lax.dot_general(
                g1, payload.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if mode == "noaccum":
            out_ref[:] = contrib
        else:
            @pl.when(first_ref[t] == 1)
            def _():
                out_ref[:] = contrib

            @pl.when(first_ref[t] == 0)
            def _():
                out_ref[:] = out_ref[:] + contrib

        if mode != "nodd":
            if mode == "tscatter_all":
                wio2 = jax.lax.broadcasted_iota(jnp.int32,
                                                (window, tile), 0)
                gdt = (wio2 == ldst[None, :]).astype(jnp.bfloat16)
                ddc = jax.lax.dot(gdt, dz.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
            else:
                ddc = jax.lax.dot_general(
                    gd, dz.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(t == 0)
            def _():
                ddf_ref[:] = jnp.zeros_like(ddf_ref)

            off = dw_ref[t] * window
            ddf_ref[pl.ds(off, window), :] = \
                ddf_ref[pl.ds(off, window), :] + ddc
        else:
            @pl.when(t == 0)
            def _():
                ddf_ref[:] = jnp.zeros_like(ddf_ref)

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="1024x256")
    ap.add_argument("--K", type=int, default=150)
    ap.add_argument("--rate", type=float, default=0.6)
    ap.add_argument("--modes", default="full,noonehot,nogather_sh,"
                    "nogather_dg,noconcat,noexp,nosplit,nodrop,"
                    "noscatter,noaccum,nodd")
    args = ap.parse_args()
    w, t = map(int, args.geom.split("x"))
    H, C = 8, 8
    HC = H * C

    from tools.gat_sweep import build_graph
    from pytorch_geometric_tpu.nn.conv import gat_dense_adj
    graph = build_graph("Pubmed")
    adj = np.asarray(gat_dense_adj(graph))
    op = PackedFlashGat(adj, window=w, tile=t)
    pk = op.bwd_pack
    dv = op._dev["bwd"]
    nw = max(pk.num_src_windows, pk.num_dst_windows)
    npad = nw * w
    cols = iota_rows(w)
    key = jax.random.PRNGKey(0)

    for mode in args.modes.split(","):
        kernel = make_kernel(mode, H, C, args.rate, op.slope, t, w)
        T = pk.num_tiles
        in_specs = [
            pl.BlockSpec((w, H + HC),
                         lambda tt, gw, dw, f, s: (gw[tt], 0)),
            pl.BlockSpec((w, H), lambda tt, gw, dw, f, s: (dw[tt], 0)),
            pl.BlockSpec((1, H), lambda tt, gw, dw, f, s: (0, 0)),
            pl.BlockSpec((w, HC + H),
                         lambda tt, gw, dw, f, s: (dw[tt], 0)),
            pl.BlockSpec((8, t), lambda tt, *_: (tt // 8, 0)),
            pl.BlockSpec((8, t), lambda tt, *_: (tt // 8, 0)),
            pl.BlockSpec((8, t), lambda tt, *_: (tt // 8, 0)),
            pl.BlockSpec((8, w), lambda tt, *_: (0, 0)),
        ]
        out_specs = [
            pl.BlockSpec((w, H + HC),
                         lambda tt, gw, dw, f, s: (gw[tt], 0)),
            pl.BlockSpec((npad, H), lambda tt, gw, dw, f, s: (0, 0)),
        ]
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4, grid=(T,), in_specs=in_specs,
                out_specs=out_specs),
            out_shape=[
                jax.ShapeDtypeStruct((npad, H + HC), jnp.float32),
                jax.ShapeDtypeStruct((npad, H), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024))

        sh = jax.random.normal(key, (npad, H + HC), jnp.bfloat16) * .1
        dp = jax.random.normal(key, (npad, H), jnp.bfloat16) * .1
        gp = jax.random.normal(key, (npad, HC + H), jnp.bfloat16) * .1
        m = jnp.ones((1, H), jnp.float32)
        seed_i = jnp.zeros((1,), jnp.int32)

        def body(c, i):
            sh, dp, gp = c
            dsdh, dd = call(dv["send_win"], dv["recv_win"],
                            dv["first"], seed_i, sh, dp, m, gp,
                            dv["lsend"], dv["lrecv"], dv["eid"], cols)
            return (jnp.maximum(sh, dsdh.astype(jnp.bfloat16) * 1e-30
                                + i * 1e-30), dp, gp), None

        @jax.jit
        def run(sh, dp, gp):
            (sh, dp, gp), _ = jax.lax.scan(
                body, (sh, dp, gp),
                jnp.arange(args.K, dtype=jnp.bfloat16))
            return jnp.sum(sh[0])

        secs, _ = bc.time_program(run, sh, dp, gp)
        per = secs / args.K
        print(f"{mode:12s}: {per*1e3:.3f} ms "
              f"({per/T*1e9:.0f} ns/tile, T={T})", flush=True)


if __name__ == "__main__":
    main()
