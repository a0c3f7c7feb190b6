"""dense_threshold sweep on the full Reddit shape (VERDICT item 1).

Cost model being tested: a (1024, 1024) bucket with c edges costs
~ceil(c/256) * 1.17 us on the packed path vs ~2.6 us (2 MB bf16 table
stream at HBM rate) + ~0 MXU on the dense path, so buckets above
~550-750 edges should ride the dense path.  The sweep measures the
real fwd-pass crossover, plus the remainder's bucket-size histogram
so the result generalises beyond one threshold.
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
    p.add_argument("--e", type=int, default=114_615_892)
    p.add_argument("--f", type=int, default=128)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--communities", type=int, default=200)
    p.add_argument("--thresholds", default="512,768,1024,2048")
    args = p.parse_args()

    from bench_common import time_program
    from bench_scale import gen_clustered
    from pytorch_geometric_tpu.ops.block_spmm import (
        BlockSpmm,
        BlockStructure,
    )

    t0 = time.perf_counter()
    senders, receivers, _ = gen_clustered(args.n, args.e,
                                          args.communities)
    print(f"gen {time.perf_counter() - t0:.1f}s", flush=True)
    rng = np.random.default_rng(1)
    w = np.ones(args.e, np.float32)
    x = jnp.asarray(rng.normal(size=(args.n, args.f)).astype(np.float32))

    # bucket-size histogram once (threshold-independent)
    window = 1024
    nw = -(-args.n // window)
    key = (receivers // window).astype(np.int64) * nw \
        + (senders // window)
    counts = np.bincount(key, minlength=nw * nw)
    nz = counts[counts > 0]
    edges_at = {}
    for lo, hi in ((1, 256), (256, 512), (512, 768), (768, 1024),
                   (1024, 4096), (4096, 1 << 30)):
        sel = (nz >= lo) & (nz < hi)
        edges_at[f"[{lo},{hi})"] = (int(sel.sum()),
                                    int(nz[sel].sum()))
    print("bucket histogram (buckets, edges):", edges_at, flush=True)

    K = args.k
    for thresh in (int(v) for v in args.thresholds.split(",")):
        t0 = time.perf_counter()
        st = BlockStructure(senders, receivers, args.n, window=window,
                            dense_threshold=thresh, sparse_tile=256)
        op = BlockSpmm(senders, receivers, args.n, w, structure=st)
        fn, consts = op.bind()
        consts = jax.tree_util.tree_map(jax.device_put, consts)
        jax.block_until_ready(consts)
        pack_s = time.perf_counter() - t0

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
        tiles = st.sparse.fwd.num_tiles if st.sparse else 0
        print(f"thresh={thresh}: {t / args.e * 1e9:.4f} ns/edge "
              f"({t * 1e3:.1f} ms) blocks={st.num_dense_blocks} "
              f"dense_frac={st.dense_edge_frac:.3f} "
              f"sparse_tiles={tiles} pack={pack_s:.1f}s", flush=True)
        del st, op, fn, consts


if __name__ == "__main__":
    main()
