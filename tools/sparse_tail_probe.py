"""Sparse-tail lever probe (round 5, VERDICT item 1).

The Reddit full-graph SpMM is bound by the packed sparse remainder:
~52k single-tile buckets at window=1024/tile=256 (~1.17 us each = ~63
of 66 ms, PERF.md round 4).  In the scattered-edge regime every
nonempty (src window, dst window) bucket holds ~E/(nw^2) edges, so the
TILE COUNT scales as nw^2 = (N/window)^2: doubling the window QUARTERS
the number of buckets while the per-tile MAC/build cost only ~doubles
(both are window-proportional).  Net: bigger windows should win
whenever buckets sit below one full tile — exactly the regime the
round-4 probe measured.

This probe measures the packed SpMM forward at fixed tile over a
window sweep on the 10M-uniform-edge shape of the round-4 probe, plus
the (window, tile) cross points, and prints ns/edge per point.
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
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=232_965)
    p.add_argument("--e", type=int, default=10_000_000)
    p.add_argument("--f", type=int, default=128)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--points", default="1024:256,2048:256,4096:256,"
                   "2048:512,4096:512,8192:256")
    args = p.parse_args()

    from bench_common import time_program

    rng = np.random.default_rng(3)
    senders = rng.integers(0, args.n, args.e)
    receivers = rng.integers(0, args.n, args.e)
    w = rng.normal(size=args.e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(args.n, args.f)).astype(np.float32))

    from pytorch_geometric_tpu.ops.spmm import SpmmOperator

    for point in args.points.split(","):
        window, tile = (int(v) for v in point.split(":"))
        t0 = time.perf_counter()
        op = SpmmOperator(senders, receivers, args.n, window=window,
                          tile=tile, compute_dtype=jnp.bfloat16,
                          light=True)
        fn, consts = op.bind_external(w)
        consts = jax.tree_util.tree_map(jax.device_put, consts)
        jax.block_until_ready(consts)
        pack_s = time.perf_counter() - t0
        K = args.k

        @jax.jit
        def run(consts, x_):
            def step(acc, i):
                return acc + jnp.sum(fn(consts, x_ * (1.0 + 1e-9 * i))
                                     [:, :1]), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(K, dtype=jnp.float32))
            return out

        secs, _ = time_program(run, consts, x, iters=2)
        t = secs / K
        print(f"window={window} tile={tile}: "
              f"{t / args.e * 1e9:.3f} ns/edge  "
              f"({t * 1e3:.2f} ms, tiles={op.fwd.num_tiles}, "
              f"inflation={op.fwd.flop_inflation:.2f}, "
              f"pack={pack_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
