"""Asymmetric-window sweep on the adversarial sparse tail (round 5).

The adversarial remainder holds ~46 edges per (1024, 1024) bucket.
Widening only the SOURCE window merges buckets along the src axis
(bucket count ~ N/ws * N/wd) while the dst window — and with it the
kernel's out-block accumulation — stays small.  tile=128 remains the
occupancy-matched tile.  Sweep ns/edge over (ws, wd, tile).
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=232_965)
    ap.add_argument("--e", type=int, default=8_000_000)
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--points",
                    default="1024:1024:128,2048:1024:128,"
                    "4096:1024:128,8192:1024:128,2048:1024:256")
    args = ap.parse_args()

    from bench_common import time_program
    from pytorch_geometric_tpu.ops.block_spmm import BlockSpmm

    rng = np.random.default_rng(7)
    ranks = rng.zipf(1.5, size=args.e).astype(np.int64) % args.n
    perm = rng.permutation(args.n)
    senders = perm[ranks]
    receivers = rng.integers(0, args.n, args.e)
    w = rng.normal(size=args.e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(args.n, args.f))
                    .astype(np.float32))
    K = args.k

    for point in args.points.split(","):
        ws, wd, tile = (int(v) for v in point.split(":"))
        t0 = time.perf_counter()
        op = BlockSpmm(senders, receivers, args.n, w, window=wd,
                       dense_threshold=1024, sparse_tile=tile,
                       sparse_window_src=None if ws == wd else ws)
        fn, consts = op.bind()
        consts = jax.tree_util.tree_map(jax.device_put, consts)
        jax.block_until_ready(consts)
        pack_s = time.perf_counter() - t0

        @jax.jit
        def run(consts, x):
            def step(acc, i):
                return acc + jnp.sum(fn(consts, x * (1.0 + 1e-9 * i))
                                     ), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(K, dtype=jnp.float32))
            return out

        secs, _ = time_program(run, consts, x, iters=2)
        t = secs / K
        sp = op.structure.sparse
        print(f"ws={ws} wd={wd} tile={tile}: "
              f"{t / args.e * 1e9:.3f} ns/edge ({t * 1e3:.1f} ms) "
              f"tiles={sp.fwd.num_tiles if sp else 0} "
              f"inflation={op.flop_inflation:.2f} "
              f"pack={pack_s:.1f}s", flush=True)
        del op, fn, consts


if __name__ == "__main__":
    main()
