"""Feasibility probe: Reddit-shaped SpMM on the real chip.

Stages: host graph gen -> C++ pack -> device upload -> packed SpMM
timing via the explicit-args path (tables as jit ARGUMENTS so the
remote compiler never sees them as constants).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def gen_clustered(n, e, communities, seed=0):
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, communities, n)
    pos_of = np.empty(n, dtype=np.int64)
    pos_of[np.argsort(comm, kind="stable")] = np.arange(n)
    starts = np.searchsorted(np.sort(comm), np.arange(communities))
    counts = np.bincount(comm, minlength=communities)
    src = rng.integers(0, n, e)
    intra = rng.random(e) < 0.9
    c = comm[src]
    dst = np.where(intra,
                   starts[c] + (rng.random(e) * counts[c]).astype(np.int64),
                   rng.integers(0, n, e))
    return pos_of[src], dst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=232_965)
    p.add_argument("--e", type=int, default=20_000_000)
    p.add_argument("--f", type=int, default=128)
    p.add_argument("--communities", type=int, default=200)
    p.add_argument("--window", type=int, default=1024)
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--skip-bwd", action="store_true")
    p.add_argument("--block", action="store_true",
                   help="use BlockSpmm (dense BSR + packed sparse)")
    p.add_argument("--dense-threshold", type=int, default=1024)
    args = p.parse_args()

    t0 = time.perf_counter()
    senders, receivers = gen_clustered(args.n, args.e, args.communities)
    print(f"gen: {time.perf_counter() - t0:.2f}s", flush=True)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(args.n, args.f)).astype(np.float32))
    w = rng.normal(size=args.e).astype(np.float32)

    if args.block:
        from pytorch_geometric_tpu.ops.block_spmm import BlockSpmm
        t0 = time.perf_counter()
        op = BlockSpmm(senders, receivers, args.n, w, window=args.window,
                       dense_threshold=args.dense_threshold,
                       sparse_tile=args.tile)
        fn, consts = op.bind()
        consts = jax.tree_util.tree_map(
            lambda a: jax.device_put(a).block_until_ready(), consts)
        print(f"block pack+upload: {time.perf_counter() - t0:.2f}s "
              f"dense_frac={op.dense_edge_frac:.3f} "
              f"blocks={op.num_dense_blocks} "
              f"sparse_inflation={op.flop_inflation:.2f}", flush=True)
    else:
        from pytorch_geometric_tpu.ops.spmm import SpmmOperator
        t0 = time.perf_counter()
        op = SpmmOperator(senders, receivers, args.n, window=args.window,
                          tile=args.tile, compute_dtype=jnp.bfloat16,
                          light=True)
        print(f"pack+upload: {time.perf_counter() - t0:.2f}s "
              f"inflation={op.fwd.flop_inflation:.3f} "
              f"tiles={op.fwd.num_tiles}", flush=True)
        t0 = time.perf_counter()
        fn, consts = op.bind_external(w)
        consts = jax.tree_util.tree_map(
            lambda a: jax.device_put(a).block_until_ready(), consts)
        print(f"bind_external (host pack + upload): "
              f"{time.perf_counter() - t0:.2f}s", flush=True)

    K = 5

    @jax.jit
    def run(consts, x_):
        def step(acc, i):
            return acc + jnp.sum(fn(consts, x_ * (1.0 + 1e-9 * i))), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return out

    t0 = time.perf_counter()
    float(run(consts, x))
    print(f"compile+first: {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    float(run(consts, x))
    dt = (time.perf_counter() - t0) / K
    print(f"spmm fwd: {dt * 1e3:.2f} ms  {dt / args.e * 1e9:.3f} ns/edge  "
          f"{args.e / dt / 1e9:.3f} Gedge/s", flush=True)
    if args.skip_bwd:
        return

    @jax.jit
    def run2(consts, x_):
        def loss(xx):
            return jnp.sum(fn(consts, xx) ** 2)

        def step(acc, i):
            l, g = jax.value_and_grad(loss)(x_ * (1.0 + 1e-9 * i))
            return acc + l + jnp.sum(g) * 0, None
        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return out

    float(run2(consts, x))
    t0 = time.perf_counter()
    float(run2(consts, x))
    dt = (time.perf_counter() - t0) / K
    print(f"spmm fwd+bwd: {dt * 1e3:.2f} ms  {dt / args.e * 1e9:.3f} ns/edge",
          flush=True)


if __name__ == "__main__":
    main()
