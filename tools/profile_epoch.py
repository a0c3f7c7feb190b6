"""Profile one training-epoch program on the TPU and print the
per-step device-op breakdown (xprof framework_op_stats over the JAX
profiler's xplane capture — works through the remote axon backend).

Usage:
    python tools/profile_epoch.py --which gat_pubmed
    python tools/profile_epoch.py --which rgcn_mutag
"""

import argparse
import glob
import json
import shutil
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench_common as bc  # noqa: E402


def build_gat_pubmed(epochs):
    import optax
    from examples.gat import GAT
    from tools.gat_sweep import build_graph
    from pytorch_geometric_tpu.nn.conv import gat_dense_adj
    from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat

    graph = build_graph("Pubmed")
    flash_op = PackedFlashGat(np.asarray(gat_dense_adj(graph)),
                              window=896, tile=224)
    from pytorch_geometric_tpu.models.citation import (
        masked_softmax_xent)
    C = 3
    model = GAT(num_classes=C, raw_final=True)
    train_idx = jnp.asarray(
        np.flatnonzero(np.asarray(graph.train_mask)), jnp.int32)
    y_train = jnp.asarray(np.asarray(graph.y)[np.asarray(train_idx)])
    ones_mask = jnp.ones(train_idx.shape[0], bool)
    key = jax.random.key(0, impl="rbg")
    params0 = model.init({"params": key, "dropout": key}, graph,
                         graph.x, flash_op=flash_op)
    tx = optax.adamw(5e-3, weight_decay=5e-4)
    opt0 = tx.init(params0)

    def epoch_step(carry, _):
        params, opt, key = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            acc = model.apply(p, graph, graph.x, train=True,
                              flash_op=flash_op,
                              rngs={"dropout": sub})
            a = jnp.take(acc, train_idx, axis=0)
            logits = (a[:, :C] / jnp.where(a[:, C:] < 1e-16, 1.0, a[:, C:])
                      + p["params"]["conv2"]["bias"])
            return masked_softmax_xent(logits, y_train, ones_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, key), loss

    @jax.jit
    def run(params, opt, key):
        (p, o, _), losses = jax.lax.scan(
            epoch_step, (params, opt, key), None, length=epochs)
        return losses[-1]

    return run, (params0, opt0, key)


def build_gcn_pubmed(epochs, backend="packed"):
    """The bench_citation_gcn_fullgraph pubmed epoch (round 5, VERDICT
    item 5: where do the ~2 ms/epoch go)."""
    import optax

    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.datasets import Planetoid
    from pytorch_geometric_tpu.models.citation import (
        GCN, softmax_xent_int_labels)
    from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm
    from pytorch_geometric_tpu.transforms import NormalizeFeatures
    from pytorch_geometric_tpu.utils.reorder import reorder_graph

    ds = Planetoid("datasets_cache", "Pubmed",
                   transform=NormalizeFeatures())
    graph = from_data(reorder_graph(ds[0]))
    full_norm = gcn_norm(graph)
    if backend == "packed":
        from pytorch_geometric_tpu.ops.spmm import SpmmOperator
        op = SpmmOperator(np.asarray(full_norm.senders),
                          np.asarray(full_norm.receivers),
                          graph.num_nodes, window=1024, tile=256,
                          compute_dtype=jnp.bfloat16)
        aggregate_fn = op.bind(full_norm.weights)
    else:
        from pytorch_geometric_tpu.ops.sorted_spmm import SortedSpmm
        sop = SortedSpmm(np.asarray(full_norm.senders),
                         np.asarray(full_norm.receivers),
                         graph.num_nodes, tile=256, rows=1024,
                         compute_dtype=jnp.bfloat16)
        norm_w = jnp.asarray(np.asarray(full_norm.weights))

        def aggregate_fn(h):
            return sop(norm_w, h)

    model = GCN(hidden_channels=16, num_classes=ds.num_classes)
    train_idx = jnp.asarray(
        np.flatnonzero(np.asarray(graph.train_mask)), jnp.int32)
    y_train = jnp.asarray(np.asarray(graph.y)[np.asarray(train_idx)])
    key = jax.random.key(0, impl="rbg")
    params0 = model.init({"params": key}, graph, graph.x,
                         aggregate_fn=aggregate_fn)
    tx = optax.adam(0.01)
    opt0 = tx.init(params0)

    def epoch_step(carry, _):
        params, opt, key = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            logits = model.apply(p, graph, graph.x, train=True,
                                 aggregate_fn=aggregate_fn,
                                 rngs={"dropout": sub})
            lg = jnp.take(logits, train_idx, axis=0)
            loss = jnp.mean(softmax_xent_int_labels(lg, y_train))
            wd = sum(jnp.sum(q ** 2) for q in
                     jax.tree_util.tree_leaves(p["params"]["conv1"]))
            return loss + 5e-4 * wd

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, key), loss

    @jax.jit
    def run(params, opt, key):
        (p, o, _), losses = jax.lax.scan(
            epoch_step, (params, opt, key), None, length=epochs)
        return losses[-1]

    return run, (params0, opt0, key)


def build_rgcn_mutag(epochs):
    import optax
    from examples.rgcn import Net
    from tools.rgcn_sweep import build_graph
    from pytorch_geometric_tpu.nn.conv.rgcn_conv import (
        rgcn_fused_op, rgcn_norm)

    graph, data = build_graph()
    et = graph.extras["edge_type"]
    norm = rgcn_norm(graph, et, 46)
    norm_np = np.asarray(norm)
    N = graph.num_nodes
    fused_ops = (
        rgcn_fused_op(graph, et, 46, "embed", in_channels=N,
                      norm=norm_np, backend="packed", window=768,
                      tile=192),
        rgcn_fused_op(graph, et, 46, "transform", norm=norm_np,
                      backend="packed", window=768, tile=192),
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
        (p, o), losses = jax.lax.scan(epoch_step, (params, opt), None,
                                      length=epochs)
        return losses[-1]

    return run, (params0, opt0)


def print_op_stats(trace_dir, steps, top=25):
    path = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")[0]
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import (
            raw_to_tool_data as rtd)
    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    tab = json.loads(data if isinstance(data, str) else data.decode())
    rows = tab[0]["rows"] if isinstance(tab, list) else tab["rows"]
    items, tot = [], 0.0
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device":
            continue
        items.append((c[7], c[3], c[4]))
        tot += c[7]
    items.sort(reverse=True)
    print(f"device total: {tot/steps/1e3:.3f} ms/epoch-step "
          f"(over {steps} steps)")
    for t, name, occ in items[:top]:
        print(f"{t/steps:9.1f} us/step x{occ/steps:5.1f}  {name[:90]}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="rgcn_mutag",
                    choices=["gat_pubmed", "rgcn_mutag", "gcn_pubmed",
                             "gcn_pubmed_sorted"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.which == "gat_pubmed":
        run, state = build_gat_pubmed(args.epochs)
    elif args.which == "gcn_pubmed":
        run, state = build_gcn_pubmed(args.epochs)
    elif args.which == "gcn_pubmed_sorted":
        run, state = build_gcn_pubmed(args.epochs, backend="sorted")
    else:
        run, state = build_rgcn_mutag(args.epochs)
    print("compiling...", flush=True)
    float(run(*state))
    tdir = tempfile.mkdtemp(prefix="jaxtrace_")
    import jax.profiler
    jax.profiler.start_trace(tdir)
    for _ in range(args.reps):
        float(run(*state))
    jax.profiler.stop_trace()
    print_op_stats(tdir, args.epochs * args.reps, args.top)
    shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
