"""PackedFlashGat (window, tile) sweep on the PubMed full-graph shape.

Times one fused attention layer (H=8, C=8) fwd and fwd+bwd per pack
geometry, K-amortised inside one scanned program.
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench_common as bc  # noqa: E402


def build_graph(name="Pubmed"):
    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.datasets import Planetoid
    from pytorch_geometric_tpu.transforms import NormalizeFeatures
    from pytorch_geometric_tpu.utils.reorder import reorder_graph

    ds = Planetoid("datasets_cache", name,
                   transform=NormalizeFeatures())
    return from_data(reorder_graph(ds[0]))


def time_layer(op, d, s, h, K=100, grad=False, rate=0.0):
    def body(c, i):
        d, s, h = c
        if grad:
            def loss(d, s, h):
                return jnp.sum(op(d, s, h, i, rate=rate) ** 2)
            gd, gs, gh = jax.grad(loss, argnums=(0, 1, 2))(d, s, h)
            return (jnp.maximum(d, gd * 1e-30 + i * 1e-30),
                    jnp.maximum(s, gs * 1e-30),
                    jnp.maximum(h, gh * 1e-30)), None
        o = op(d, s, h, i, rate=rate)
        return (jnp.maximum(d, o[:, :d.shape[1]] * 1e-30 + i * 1e-30),
                s, h), None

    @jax.jit
    def run(d, s, h):
        (d, s, h), _ = jax.lax.scan(body, (d, s, h),
                                    jnp.arange(K, dtype=jnp.float32))
        return jnp.sum(d[0]), d

    secs, _ = bc.time_program(run, d, s, h)
    return secs / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geoms", default="1024x256,768x192,512x128")
    ap.add_argument("--K", type=int, default=100)
    ap.add_argument("--onehot", default="build")
    ap.add_argument("--rate", type=float, default=0.6)
    ap.add_argument("--dataset", default="Pubmed")
    args = ap.parse_args()

    from pytorch_geometric_tpu.nn.conv import gat_dense_adj
    from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat

    graph = build_graph(args.dataset)
    adj = np.asarray(gat_dense_adj(graph))
    n = graph.num_nodes
    H, C = 8, 8
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, H)) * 0.1
    s = jax.random.normal(key, (n, H)) * 0.1
    h = jax.random.normal(key, (n, H * C)) * 0.1

    for geom in args.geoms.split(","):
        w, t = map(int, geom.split("x"))
        op = PackedFlashGat(adj, window=w, tile=t,
                            onehot=args.onehot)
        fwd = time_layer(op, d, s, h, args.K, rate=args.rate)
        both = time_layer(op, d, s, h, args.K, grad=True,
                          rate=args.rate)
        print(f"w={w} t={t}: tiles={op.num_tiles} "
              f"infl={op.inflation:.2f} fwd={fwd*1e3:.3f}ms "
              f"fwd+bwd={both*1e3:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
