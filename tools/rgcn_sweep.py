"""RGCN packed-kernel (window, tile) sweep + epoch breakdown on TPU.

Measures, for the full-graph MUTAG-RDF workload (the 0.844x VERDICT
row): layer-1 fused fwd, fwd+bwd, and the full training epoch at
several pack geometries.  Protocol: K iterations amortised inside one
scanned program (bench_common).
"""

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_common as bc


def build_graph():
    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.datasets import Entities
    from pytorch_geometric_tpu.utils.reorder import rcm_permutation

    ds = Entities("datasets_cache_fullmutag", "MUTAG", scale=1.0)
    data = ds[0]
    ei = np.asarray(data.edge_index)
    n = data.num_nodes
    perm = rcm_permutation(ei[0], ei[1], n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    data.edge_index = inv[ei]
    data.y = np.asarray(data.y)[perm]
    data.train_idx = inv[np.asarray(data.train_idx)]
    data.test_idx = inv[np.asarray(data.test_idx)]
    return from_data(data), data


def time_op(op, xB2d, att, K=200, grad=False):
    """Seconds per op application, amortised over K scan iterations."""

    def body(c, i):
        x, a = c
        if grad:
            def loss(x, a):
                return jnp.sum(op(x, a) ** 2)
            gx, ga = jax.grad(loss, argnums=(0, 1))(x, a)
            # non-factorable perturbation so XLA can't hoist the op
            return (jnp.maximum(x, gx * 1e-30 + i * 1e-30),
                    jnp.maximum(a, ga * 1e-30)), None
        o = op(x, a)
        return (jnp.maximum(x, jnp.pad(
            o * 1e-30, ((0, x.shape[0] - o.shape[0]),
                        (0, x.shape[1] - o.shape[1])))
            + i * 1e-30), a), None

    @jax.jit
    def run(x, a):
        (x, a), _ = jax.lax.scan(body, (x, a),
                                 jnp.arange(K, dtype=jnp.float32))
        return jnp.sum(x[0]), x

    secs, _ = bc.time_program(run, xB2d, att)
    return secs / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geoms", default="1024x256,1024x128,512x128,512x64")
    ap.add_argument("--K", type=int, default=200)
    ap.add_argument("--onehot", default="build")
    ap.add_argument("--epoch", action="store_true",
                    help="also time the full training epoch per geom")
    args = ap.parse_args()

    graph, data = build_graph()
    et = graph.extras["edge_type"]
    from pytorch_geometric_tpu.nn.conv.rgcn_conv import (
        rgcn_fused_op, rgcn_norm)

    norm = rgcn_norm(graph, et, 46)
    norm_np = np.asarray(norm)
    N = graph.num_nodes
    B, C = 30, 16
    key = jax.random.PRNGKey(0)
    xB2d = jax.random.normal(key, (N, B * C), jnp.float32) * 0.1
    att = jax.random.normal(key, (46, B), jnp.float32) * 0.1

    for geom in args.geoms.split(","):
        w, t = map(int, geom.split("x"))
        op = rgcn_fused_op(graph, et, 46, "embed", in_channels=N,
                           norm=norm_np, backend="packed",
                           window=w, tile=t, onehot=args.onehot)
        fwd = time_op(op, xB2d, att, args.K)
        both = time_op(op, xB2d, att, args.K, grad=True)
        print(f"w={w} t={t}: tiles={op.num_tiles} "
              f"infl={op.inflation:.2f} fwd={fwd*1e3:.2f}ms "
              f"fwd+bwd={both*1e3:.2f}ms", flush=True)

    if args.epoch:
        import optax

        from examples.rgcn import Net
        for geom in args.geoms.split(","):
            w, t = map(int, geom.split("x"))
            fused_ops = (
                rgcn_fused_op(graph, et, 46, "embed", in_channels=N,
                              norm=norm_np, backend="packed",
                              window=w, tile=t, onehot=args.onehot),
                rgcn_fused_op(graph, et, 46, "transform", norm=norm_np,
                              backend="packed", window=w, tile=t,
                              onehot=args.onehot),
            )
            train_idx = jnp.asarray(np.asarray(data.train_idx))
            y = graph.y
            model = Net(num_nodes=N, num_relations=46, num_classes=2)
            params0 = model.init(jax.random.PRNGKey(0), graph, et, norm,
                                 fused_ops=fused_ops)
            tx = optax.adam(0.01)
            opt0 = tx.init(params0)

            def epoch_step(carry, _):
                params, opt = carry

                def loss_fn(p):
                    logits = model.apply(p, graph, et, norm,
                                         fused_ops=fused_ops)
                    logp = jax.nn.log_softmax(logits)
                    sel = jnp.take(logp, train_idx, axis=0)
                    lab = jnp.take(y, train_idx).astype(jnp.int32)
                    return -jnp.mean(jnp.take_along_axis(
                        sel, lab[:, None], axis=1))

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt = tx.update(grads, opt, params)
                return (optax.apply_updates(params, updates), opt), loss

            @jax.jit
            def run(params, opt):
                (p, o), losses = jax.lax.scan(
                    epoch_step, (params, opt), None, length=args.K)
                return losses[-1], None

            secs, _ = bc.time_program(run, params0, opt0)
            print(f"epoch w={w} t={t}: {secs / args.K * 1e3:.2f} ms"
                  f" -> 200ep {secs / args.K * 200:.3f}s", flush=True)


if __name__ == "__main__":
    main()
