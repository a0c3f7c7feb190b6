"""Shared benchmark machinery + the 7 headline training benches.

Mirrors the reference's README speed table (200-epoch full-training
wall-clock on a GTX 1080Ti — reference README.md:55-128, BASELINE.md):
Cora/CiteSeer/PubMed x GCN/GAT + MUTAG-RDF RGCN.

Timing protocol (honest on the remote "axon" backend):

- ``block_until_ready`` can return before execution completes, so every
  timed program returns a scalar that is host-forced (``float()``).
- K independent 200-epoch trainings run inside ONE program (a scan over
  fold_in'd keys), so the per-call RPC roundtrip (~24 ms) is amortised
  K-fold instead of subtracted at full weight (round-1 ADVICE.md: the
  subtraction dominated the fastest results).  The residual floor is
  still subtracted once.

Honesty gates (VERDICT.md round 1, item 5):

- the timed program itself returns held-out val/test accuracy of the
  final parameters, evaluated FULL-GRAPH (adds one forward per K*200
  epochs — <1% of the measured time); the bench asserts them.
- closure-path benches also return the max |logit| gap between the
  closure forward and the full-graph forward at the final parameters —
  the gradient-identity claim (tests/test_closure.py), re-verified in
  the timed artifact itself.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def tune_host_malloc():
    """Keep freed glibc arenas mapped (mallopt) — on this class of
    small overcommitted VM a fresh page fault costs ~50 us, so every
    multi-GB numpy temporary that munmaps on free and re-faults on the
    next alloc runs ~20x slower than arena reuse (measured: 500 MB
    copy 4.6 s cold vs 0.24 s on a kept arena)."""
    import ctypes
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        gib = 1 << 30
        libc.mallopt(-3, gib)        # M_MMAP_THRESHOLD
        libc.mallopt(-1, gib)        # M_TRIM_THRESHOLD
        libc.mallopt(-2, 256 << 20)  # M_TOP_PAD
    except Exception:
        pass


tune_host_malloc()

BASELINES = {  # reference wall-clock seconds on GTX 1080Ti (README.md)
    ("cora", "gcn"): 0.25, ("cora", "gat"): 0.80,
    ("citeseer", "gcn"): 0.30, ("citeseer", "gat"): 0.88,
    ("pubmed", "gcn"): 0.32, ("pubmed", "gat"): 2.42,
    ("mutag", "rgcn"): 2.14,
}

_RPC_FLOOR = None


def rpc_floor():
    """Host<->device roundtrip latency of this backend."""
    global _RPC_FLOOR
    if _RPC_FLOOR is None:
        tiny = jax.jit(lambda i: i + 1.0)
        float(tiny(0.0))
        t0 = time.perf_counter()
        for i in range(10):
            float(tiny(float(i)))
        _RPC_FLOOR = (time.perf_counter() - t0) / 10
    return _RPC_FLOOR


def time_program(fn, *args, iters=3):
    """Best-of-iters wall-clock of ``fn(*args)`` whose FIRST output is a
    scalar used as the completion barrier; returns (seconds, last_out)."""
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0])
    rpc = rpc_floor()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - rpc, 1e-9), out


def emit(metric, seconds, baseline, extra=None, synthetic=None):
    rec = {"metric": metric, "value": round(seconds, 6), "unit": "s",
           "vs_baseline": round(baseline / seconds, 3) if baseline
           else None}
    if synthetic is not None:
        rec["synthetic"] = bool(synthetic)
    if extra:
        rec["detail"] = extra
    print(json.dumps(rec), flush=True)
    return rec


def dataset_is_synthetic(ds) -> bool:
    """True when the cached corpus is the air-gapped synthetic fallback
    (datasets write a raw_dir/SYNTHETIC marker when they generate data
    instead of parsing real raw files)."""
    import os.path as osp
    raw = getattr(ds, "raw_dir", None)
    return bool(raw) and osp.exists(osp.join(raw, "SYNTHETIC"))


#: dataset-calibrated (min_val, min_test) gates for REAL corpora —
#: the reference's published accuracies minus ~3 points of seed
#: variance (Kipf GCN: Cora .815 / CiteSeer .703 / PubMed .790;
#: GAT: .830/.725/.790; RGCN Entities-MUTAG test ~.73).  Synthetic
#: planted graphs keep the callers' smoke thresholds — a real-data run
#: therefore validates parity with the published numbers with zero
#: code change (VERDICT round 4, item 7).
REAL_GATES = {
    ("cora", "gcn"): (0.76, 0.78),
    ("citeseer", "gcn"): (0.66, 0.67),
    ("pubmed", "gcn"): (0.74, 0.76),
    ("cora", "gat"): (0.76, 0.78),
    ("citeseer", "gat"): (0.66, 0.68),
    ("pubmed", "gat"): (0.74, 0.76),
    ("mutag", "rgcn"): (0.0, 0.65),
}


def resolve_gates(dataset: str, model: str, ds, min_val: float,
                  min_test: float):
    """(val_gate, test_gate, is_synthetic) — calibrated gates on real
    corpora, the caller's smoke gates on synthetic fallbacks."""
    syn = dataset_is_synthetic(ds)
    if not syn:
        gv, gt = REAL_GATES.get((dataset.lower(), model),
                                (min_val, min_test))
        return max(min_val, gv), max(min_test, gt), syn
    return min_val, min_test, syn


def bench_citation_gcn(dataset: str, epochs: int = 200, K: int = 8,
                       min_val_acc: float = 0.6,
                       min_test_acc: float = 0.6):
    """Closure-path GCN 200-epoch training (the headline row)."""
    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.data.closure import (
        layered_training_closure)
    from pytorch_geometric_tpu.datasets import Planetoid
    from pytorch_geometric_tpu.models.citation import (
        GCN, create_gcn_train_step)
    from pytorch_geometric_tpu.nn.conv.gcn_conv import (
        gcn_closure_norm, gcn_norm)
    from pytorch_geometric_tpu.transforms import NormalizeFeatures

    ds = Planetoid("datasets_cache", dataset.capitalize(),
                   transform=NormalizeFeatures())
    graph = from_data(ds[0])
    model = GCN(hidden_channels=16, num_classes=ds.num_classes)
    init_fn, epoch_step, eval_fn = create_gcn_train_step(model, graph,
                                                         closure=True)
    # rbg keys: hardware-RNG dropout bits (threefry's (N, 500)
    # mask generation profiled at ~300 us/epoch-step)
    key = jax.random.key(0, impl="rbg")
    params0, opt0 = init_fn(key)

    # closure-vs-full parity artifacts (same params, train=False)
    emask = np.asarray(graph.real_edge_mask())
    ei = np.stack([np.asarray(graph.senders)[emask],
                   np.asarray(graph.receivers)[emask]])
    seeds = np.flatnonzero(np.asarray(graph.train_mask))
    layers = layered_training_closure(ei, seeds, 2,
                                      num_nodes=graph.num_nodes)
    closure_norms = gcn_closure_norm(ei, graph.num_nodes, layers)
    x0 = jnp.take(graph.x, layers[0].in_global, axis=0)
    seeds_j = jnp.asarray(seeds)
    norm = gcn_norm(graph)
    n_train = len(seeds)

    @jax.jit
    def run(params, opt_state, key):
        def one(carry, i):
            acc, p_keep, o_keep = carry
            (p, o, _), m = jax.lax.scan(
                epoch_step, (params, opt_state, jax.random.fold_in(key, i)),
                None, length=epochs)
            return (acc + m["loss"][-1], p, o), None
        (acc, p, o), _ = jax.lax.scan(one, (0.0, params, opt_state),
                                      jnp.arange(K))
        ev = eval_fn(p)
        logits_cl = model.apply(p, None, x0, train=False, closure=layers,
                                closure_norms=closure_norms)[:n_train]
        logits_full = model.apply(p, graph, graph.x, norm, train=False)
        # RELATIVE gap: absolute logit differences scale with the
        # trained-logit magnitude (run-to-run bf16/reduction noise made
        # a 1e-3 absolute gate flaky); a real closure bug shows as O(1)
        gap = (jnp.max(jnp.abs(logits_cl
                               - jnp.take(logits_full, seeds_j, axis=0)))
               / (1.0 + jnp.max(jnp.abs(logits_full))))
        return acc, ev, gap

    secs, (_, ev, gap) = time_program(run, params0, opt0, key)
    per = secs / K
    val, test = float(ev["val_acc"]), float(ev["test_acc"])
    gap = float(gap)
    min_val_acc, min_test_acc, syn = resolve_gates(
        dataset, "gcn", ds, min_val_acc, min_test_acc)
    assert val > min_val_acc and test > min_test_acc, \
        f"{dataset} gcn held-out acc too low: val={val} test={test} " \
        f"(gates {min_val_acc}/{min_test_acc}, synthetic={syn})"
    assert gap < 1e-3, f"closure/full logit gap {gap}"
    return emit(f"{dataset}_gcn_{epochs}epoch_wallclock", per,
                BASELINES[(dataset, "gcn")],
                {"val_acc": round(val, 4), "test_acc": round(test, 4),
                 "closure_full_logit_gap": gap, "K": K},
                synthetic=syn)


def bench_citation_gat(dataset: str, epochs: int = 200, K: int = 8,
                       min_val_acc: float = 0.6,
                       min_test_acc: float = 0.6):
    """Closure-path GAT 200-epoch training (the headline row)."""
    import optax

    from examples.gat import GAT
    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.data.closure import (
        layered_training_closure)
    from pytorch_geometric_tpu.datasets import Planetoid
    from pytorch_geometric_tpu.models.citation import (
        masked_accuracy, masked_softmax_xent)
    from pytorch_geometric_tpu.transforms import NormalizeFeatures

    ds = Planetoid("datasets_cache", dataset.capitalize(),
                   transform=NormalizeFeatures())
    graph = from_data(ds[0])
    model = GAT(num_classes=ds.num_classes)
    emask = np.asarray(graph.real_edge_mask())
    ei = np.stack([np.asarray(graph.senders)[emask],
                   np.asarray(graph.receivers)[emask]])
    seeds = np.flatnonzero(np.asarray(graph.train_mask))
    closure = layered_training_closure(ei, seeds, 2,
                                       num_nodes=graph.num_nodes)
    x_in = jnp.take(graph.x, closure[0].in_global, axis=0)
    yv = jnp.asarray(np.asarray(graph.y)[seeds])
    tmask = jnp.ones(seeds.shape[0], bool)
    seeds_j = jnp.asarray(seeds)
    # rbg keys: hardware-RNG dropout bits (threefry's (N, 500)
    # mask generation profiled at ~300 us/epoch-step)
    key = jax.random.key(0, impl="rbg")
    params0 = model.init({"params": key, "dropout": key}, graph, x_in,
                         closure=closure)
    tx = optax.adamw(5e-3, weight_decay=5e-4)
    opt0 = tx.init(params0)
    n_seed = int(tmask.shape[0])

    def epoch_step(carry, _):
        params, opt, key = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            logits = model.apply(p, graph, x_in, train=True,
                                 closure=closure,
                                 rngs={"dropout": sub})[:n_seed]
            return masked_softmax_xent(logits, yv, tmask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, key), loss

    @jax.jit
    def run(params, opt, key):
        def one(carry, i):
            acc, p_keep, o_keep = carry
            (p, o, _), losses = jax.lax.scan(
                epoch_step, (params, opt, jax.random.fold_in(key, i)),
                None, length=epochs)
            return (acc + losses[-1], p, o), None
        (acc, p, o), _ = jax.lax.scan(one, (0.0, params, opt),
                                      jnp.arange(K))
        logits_full = model.apply(p, graph, graph.x)
        ev = {
            "val_acc": masked_accuracy(logits_full, graph.y,
                                       graph.val_mask),
            "test_acc": masked_accuracy(logits_full, graph.y,
                                        graph.test_mask),
        }
        logits_cl = model.apply(p, graph, x_in,
                                closure=closure)[:n_seed]
        gap = (jnp.max(jnp.abs(logits_cl
                               - jnp.take(logits_full, seeds_j, axis=0)))
               / (1.0 + jnp.max(jnp.abs(logits_full))))
        return acc, ev, gap

    secs, (_, ev, gap) = time_program(run, params0, opt0, key)
    per = secs / K
    val, test = float(ev["val_acc"]), float(ev["test_acc"])
    gap = float(gap)
    min_val_acc, min_test_acc, syn = resolve_gates(
        dataset, "gat", ds, min_val_acc, min_test_acc)
    assert val > min_val_acc and test > min_test_acc, \
        f"{dataset} gat held-out acc too low: val={val} test={test} " \
        f"(gates {min_val_acc}/{min_test_acc}, synthetic={syn})"
    assert gap < 1e-2, f"closure/full logit gap {gap}"
    return emit(f"{dataset}_gat_{epochs}epoch_wallclock", per,
                BASELINES[(dataset, "gat")],
                {"val_acc": round(val, 4), "test_acc": round(test, 4),
                 "closure_full_logit_gap": gap, "K": K},
                synthetic=syn)


def bench_citation_gat_fullgraph(dataset: str, epochs: int = 200,
                                 K: int = 4, min_val_acc: float = 0.6,
                                 min_test_acc: float = 0.6):
    """FULL-GRAPH (non-closure) GAT 200-epoch training through the
    packed-edge fused attention kernel (ops/packed_gat.py) after RCM
    reordering — the kernel-capability row (VERDICT round 1, item 1);
    the closure rows above remain the headline numbers."""
    import optax

    from examples.gat import GAT
    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.datasets import Planetoid
    from pytorch_geometric_tpu.models.citation import (
        masked_accuracy, masked_softmax_xent)
    from pytorch_geometric_tpu.nn.conv import gat_dense_adj
    from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat
    from pytorch_geometric_tpu.transforms import NormalizeFeatures
    from pytorch_geometric_tpu.utils.reorder import reorder_graph

    ds = Planetoid("datasets_cache", dataset.capitalize(),
                   transform=NormalizeFeatures())
    graph = from_data(reorder_graph(ds[0]))
    flash_op = PackedFlashGat(np.asarray(gat_dense_adj(graph)),
                              window=896, tile=224)
    C = ds.num_classes
    # raw_final: conv2 hands back its undivided num‖den accumulator so
    # the loss gathers the ~60-120 train rows BEFORE the (N, C)
    # division/log-softmax chain — those narrow arrays are 128-lane
    # padded, and running the chain over all N costs ~0.5 ms/step
    model = GAT(num_classes=C, raw_final=True)
    model_eval = GAT(num_classes=C)
    train_idx = jnp.asarray(
        np.flatnonzero(np.asarray(graph.train_mask)), jnp.int32)
    y_train = jnp.asarray(np.asarray(graph.y)[np.asarray(train_idx)])
    ones_mask = jnp.ones(train_idx.shape[0], bool)
    # rbg keys: hardware-RNG dropout bits (threefry's (N, 500)
    # mask generation profiled at ~300 us/epoch-step)
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
            a = jnp.take(acc, train_idx, axis=0)      # (n_train, C+1)
            logits = (a[:, :C] / jnp.where(a[:, C:] < 1e-16, 1.0, a[:, C:])
                      + p["params"]["conv2"]["bias"])
            return masked_softmax_xent(logits, y_train, ones_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, key), loss

    @jax.jit
    def run(params, opt, key):
        def one(carry, i):
            acc, p_keep, o_keep = carry
            (p, o, _), losses = jax.lax.scan(
                epoch_step, (params, opt, jax.random.fold_in(key, i)),
                None, length=epochs)
            return (acc + losses[-1], p, o), None
        (acc, p, o), _ = jax.lax.scan(one, (0.0, params, opt),
                                      jnp.arange(K))
        logits = model_eval.apply(p, graph, graph.x, flash_op=flash_op)
        ev = {
            "val_acc": masked_accuracy(logits, graph.y, graph.val_mask),
            "test_acc": masked_accuracy(logits, graph.y,
                                        graph.test_mask),
        }
        return acc, ev

    secs, (_, ev) = time_program(run, params0, opt0, key)
    per = secs / K
    val, test = float(ev["val_acc"]), float(ev["test_acc"])
    min_val_acc, min_test_acc, syn = resolve_gates(
        dataset, "gat", ds, min_val_acc, min_test_acc)
    assert val > min_val_acc and test > min_test_acc, \
        f"{dataset} fullgraph gat acc too low: val={val} test={test} " \
        f"(gates {min_val_acc}/{min_test_acc}, synthetic={syn})"
    return emit(f"{dataset}_gat_fullgraph_{epochs}epoch_wallclock", per,
                BASELINES[(dataset, "gat")],
                {"val_acc": round(val, 4), "test_acc": round(test, 4),
                 "K": K, "kernel": "packed_flash_gat"},
                synthetic=syn)


def bench_citation_gcn_fullgraph(dataset: str, epochs: int = 200,
                                 K: int = 4, backend: str = None,
                                 min_val_acc: float = 0.6,
                                 min_test_acc: float = 0.6):
    """FULL-GRAPH (non-closure) GCN 200-epoch training — every edge
    participates in every epoch's SpMM, answering the reference's
    strongest published rows (README.md:67-100: Cora 0.25 s,
    CiteSeer 0.30 s, PubMed 0.32 s on a GTX 1080Ti).

    Aggregation backend: ``dense`` — precomputed normalised adjacency as
    one bf16 MXU matmul per layer (small N); ``hybrid`` — RCM-reordered
    HybridSpmm (Pallas dense buckets + XLA sparse remainder).  Default
    picks dense below ~8k padded nodes.
    """
    import optax

    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.datasets import Planetoid
    from pytorch_geometric_tpu.models.citation import (
        GCN, masked_accuracy, softmax_xent_int_labels)
    from pytorch_geometric_tpu.nn.conv.gcn_conv import (
        gcn_norm, gcn_norm_dense)
    from pytorch_geometric_tpu.transforms import NormalizeFeatures
    from pytorch_geometric_tpu.utils.reorder import reorder_graph

    ds = Planetoid("datasets_cache", dataset.capitalize(),
                   transform=NormalizeFeatures())
    graph = from_data(reorder_graph(ds[0]))
    if backend is None:
        backend = "dense" if graph.num_nodes <= 8192 else "packed"
    aggregate_fn, norm_dense = None, None
    if backend == "dense":
        norm_dense = gcn_norm_dense(graph, dtype=jnp.bfloat16)
    elif backend == "packed":
        # one fused Pallas kernel per aggregation pass (bf16 slabs,
        # lane-compact transposed out at F<=64): measured 0.35 ms per
        # 113k-edge PubMed pass at (1024, 256) — the dense (N, N) path
        # streams 777 MB/pass at this N and loses 4x
        from pytorch_geometric_tpu.ops.spmm import SpmmOperator
        full_norm = gcn_norm(graph)
        op = SpmmOperator(np.asarray(full_norm.senders),
                          np.asarray(full_norm.receivers),
                          graph.num_nodes, window=1024, tile=256,
                          compute_dtype=jnp.bfloat16)
        aggregate_fn = op.bind(full_norm.weights)
    elif backend == "hybrid":
        from pytorch_geometric_tpu.ops.hybrid_spmm import HybridSpmm
        full_norm = gcn_norm(graph)
        op = HybridSpmm(np.asarray(full_norm.senders),
                        np.asarray(full_norm.receivers),
                        graph.num_nodes, window=1024, tile=256)
        norm_w = full_norm.weights

        def aggregate_fn(h):
            return op(norm_w, h)
    elif backend == "fused":
        # whole-forward fusion (round 5): both aggregations + the
        # inter-layer elementwise in ONE pallas launch per direction —
        # attacks the measured launch-floor bound (PERF.md)
        return _bench_gcn_fullgraph_fused(dataset, epochs, K,
                                          min_val_acc, min_test_acc)
    elif backend == "sorted":
        # sorted-CSR per-edge path (round-5, VERDICT item 5): XLA
        # gather in packed order + one-hot scatter with bf16 messages
        # and lane-compact transposed out — pays the per-row gather
        # ceiling instead of window x 128-lane MACs
        from pytorch_geometric_tpu.ops.sorted_spmm import SortedSpmm
        full_norm = gcn_norm(graph)
        sop = SortedSpmm(np.asarray(full_norm.senders),
                         np.asarray(full_norm.receivers),
                         graph.num_nodes, tile=256, rows=1024,
                         compute_dtype=jnp.bfloat16)
        norm_w = jnp.asarray(np.asarray(full_norm.weights))

        def aggregate_fn(h):
            return sop(norm_w, h)
    else:
        raise ValueError(backend)

    model = GCN(hidden_channels=16, num_classes=ds.num_classes)
    train_idx = jnp.asarray(
        np.flatnonzero(np.asarray(graph.train_mask)), jnp.int32)
    y_train = jnp.asarray(np.asarray(graph.y)[np.asarray(train_idx)])
    # rbg keys: hardware-RNG dropout bits (threefry's (N, F) mask
    # generation profiled at ~300 us/epoch-step)
    key = jax.random.key(0, impl="rbg")
    params0 = model.init({"params": key}, graph, graph.x,
                         norm_dense=norm_dense,
                         aggregate_fn=aggregate_fn)
    tx = optax.adam(0.01)
    opt0 = tx.init(params0)

    def epoch_step(carry, _):
        # the dense normalised adjacency rides the CARRY, not a
        # closure: a 777 MB (N, N) bf16 constant serialized into the
        # program body is rejected by the remote compiler (HTTP 413)
        params, opt, key, nd = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            logits = model.apply(p, graph, graph.x, train=True,
                                 norm_dense=nd,
                                 aggregate_fn=aggregate_fn,
                                 rngs={"dropout": sub})
            # gather the ~60-120 train rows BEFORE the log-softmax/xent
            # chain: (N, C) is 128-lane padded and the chain + its
            # backward re-traverse it (same finding as the GAT raw_out
            # path, PERF.md round 3)
            lg = jnp.take(logits, train_idx, axis=0)
            loss = jnp.mean(softmax_xent_int_labels(lg, y_train))
            wd = sum(jnp.sum(q ** 2) for q in
                     jax.tree_util.tree_leaves(p["params"]["conv1"]))
            return loss + 5e-4 * wd

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, key, nd), \
            loss

    @jax.jit
    def run(params, opt, key, nd):
        def one(carry, i):
            acc, p_keep, o_keep = carry
            (p, o, _, _), losses = jax.lax.scan(
                epoch_step,
                (params, opt, jax.random.fold_in(key, i), nd),
                None, length=epochs)
            return (acc + losses[-1], p, o), None
        (acc, p, o), _ = jax.lax.scan(one, (0.0, params, opt),
                                      jnp.arange(K))
        logits = model.apply(p, graph, graph.x, norm_dense=nd,
                             aggregate_fn=aggregate_fn)
        ev = {
            "val_acc": masked_accuracy(logits, graph.y, graph.val_mask),
            "test_acc": masked_accuracy(logits, graph.y,
                                        graph.test_mask),
        }
        return acc, ev

    nd_arg = norm_dense if norm_dense is not None else \
        jnp.zeros((0, 0), jnp.bfloat16)
    if norm_dense is None:
        # XLA path variants read aggregate_fn; keep nd out of the carry
        nd_arg = None
    secs, (_, ev) = time_program(run, params0, opt0, key, nd_arg)
    per = secs / K
    val, test = float(ev["val_acc"]), float(ev["test_acc"])
    min_val_acc, min_test_acc, syn = resolve_gates(
        dataset, "gcn", ds, min_val_acc, min_test_acc)
    assert val > min_val_acc and test > min_test_acc, \
        f"{dataset} fullgraph gcn acc too low: val={val} test={test} " \
        f"(gates {min_val_acc}/{min_test_acc}, synthetic={syn})"
    return emit(f"{dataset}_gcn_fullgraph_{epochs}epoch_wallclock", per,
                BASELINES[(dataset, "gcn")],
                {"val_acc": round(val, 4), "test_acc": round(test, 4),
                 "K": K, "kernel": f"gcn_{backend}"},
                synthetic=syn)


def _bench_gcn_fullgraph_fused(dataset, epochs, K, min_val_acc,
                               min_test_acc):
    """FULL-GRAPH GCN with the fused 2-layer kernel: forward = ONE
    pallas launch (both aggregations + bias/relu/dropout/W2 inside),
    backward = one more — vs four separate aggregation launches on the
    packed backend (the measured launch floor, PERF.md round 5)."""
    import optax

    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.datasets import Planetoid
    from pytorch_geometric_tpu.models.citation import (
        masked_accuracy, softmax_xent_int_labels)
    from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm
    from pytorch_geometric_tpu.ops.fused_gcn import FusedGcn2
    from pytorch_geometric_tpu.transforms import NormalizeFeatures
    from pytorch_geometric_tpu.utils.reorder import reorder_graph

    ds = Planetoid("datasets_cache", dataset.capitalize(),
                   transform=NormalizeFeatures())
    graph = from_data(reorder_graph(ds[0]))
    norm = gcn_norm(graph)
    N = graph.num_nodes
    H, C = 16, ds.num_classes
    fused = FusedGcn2(np.asarray(norm.senders),
                      np.asarray(norm.receivers), N,
                      np.asarray(norm.weights), hidden=H, classes=C,
                      window=1024, tile=256, dropout_rate=0.5)
    Fin = graph.x.shape[1]
    train_idx = jnp.asarray(
        np.flatnonzero(np.asarray(graph.train_mask)), jnp.int32)
    y_train = jnp.asarray(np.asarray(graph.y)[np.asarray(train_idx)])

    rng = np.random.default_rng(0)
    glorot1 = float(np.sqrt(6.0 / (Fin + H)))
    glorot2 = float(np.sqrt(6.0 / (H + C)))
    params0 = {
        "W1": jnp.asarray(rng.uniform(-glorot1, glorot1,
                                      (Fin, H)).astype(np.float32)),
        "b1": jnp.zeros((H,), jnp.float32),
        "W2": jnp.asarray(rng.uniform(-glorot2, glorot2,
                                      (H, C)).astype(np.float32)),
        "b2": jnp.zeros((C,), jnp.float32),
    }
    tx = optax.adam(0.01)
    opt0 = tx.init(params0)
    key = jax.random.key(0, impl="rbg")
    xj = graph.x

    def epoch_step(carry, _):
        params, opt, key = carry
        key, k0, k1 = jax.random.split(key, 3)
        seed = jax.random.randint(k1, (), 0, 2 ** 31 - 1) \
            .astype(jnp.float32)
        keep0 = jax.random.bernoulli(k0, 0.5, xj.shape)

        def loss_fn(p):
            x_in = jnp.where(keep0, xj * 2.0, 0.0)
            logits = fused(x_in @ p["W1"], p["W2"], p["b1"], seed) \
                + p["b2"][None, :]
            lg = jnp.take(logits, train_idx, axis=0)
            loss = jnp.mean(softmax_xent_int_labels(lg, y_train))
            wd = jnp.sum(p["W1"] ** 2) + jnp.sum(p["b1"] ** 2)
            return loss + 5e-4 * wd

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, key), loss

    # eval forward through the packed aggregate (rate 0), explicit-args
    agg_fn, agg_consts = fused.op.bind_external(
        np.asarray(norm.weights))

    @jax.jit
    def run(params, opt, key, consts):
        def one(carry, i):
            acc, p_keep, o_keep = carry
            (p, o, _), losses = jax.lax.scan(
                epoch_step, (params, opt, jax.random.fold_in(key, i)),
                None, length=epochs)
            return (acc + losses[-1], p, o), None
        (acc, p, o), _ = jax.lax.scan(one, (0.0, params, opt),
                                      jnp.arange(K))
        h1 = jax.nn.relu(agg_fn(consts, xj @ p["W1"]) + p["b1"])
        logits = agg_fn(consts, h1 @ p["W2"]) + p["b2"]
        ev = {
            "val_acc": masked_accuracy(logits, graph.y,
                                       graph.val_mask),
            "test_acc": masked_accuracy(logits, graph.y,
                                        graph.test_mask),
        }
        return acc, ev

    secs, (_, ev) = time_program(run, params0, opt0, key, agg_consts)
    per = secs / K
    val, test = float(ev["val_acc"]), float(ev["test_acc"])
    min_val_acc, min_test_acc, syn = resolve_gates(
        dataset, "gcn", ds, min_val_acc, min_test_acc)
    assert val > min_val_acc and test > min_test_acc, \
        f"{dataset} fused gcn acc too low: val={val} test={test} " \
        f"(gates {min_val_acc}/{min_test_acc}, synthetic={syn})"
    return emit(f"{dataset}_gcn_fullgraph_{epochs}epoch_wallclock", per,
                BASELINES[(dataset, "gcn")],
                {"val_acc": round(val, 4), "test_acc": round(test, 4),
                 "K": K, "kernel": "gcn_fused2 (one pallas launch per "
                 "direction)"},
                synthetic=syn)


def bench_rgcn(epochs: int = 200, K: int = 4,
               min_test_acc: float = 0.5):
    """MUTAG-RDF RGCN 200-epoch full-batch (reference README.md:109-114:
    2.14 s).  Full-scale entity graph (23644 nodes, 46 relations,
    num_bases=30), closure training + full-graph eval."""
    import optax

    from examples.rgcn import Net
    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.data.closure import (
        layered_training_closure)
    from pytorch_geometric_tpu.datasets import Entities
    from pytorch_geometric_tpu.nn.conv.rgcn_conv import (
        rgcn_closure_norm, rgcn_norm)

    ds = Entities("datasets_cache_fullmutag", "MUTAG", scale=1.0)
    data = ds[0]
    graph = from_data(data)
    y = graph.y
    train_idx = np.asarray(data.train_idx)
    test_idx = np.asarray(data.test_idx)
    layers = layered_training_closure(
        np.asarray(data.edge_index), train_idx, 2,
        num_nodes=graph.num_nodes,
        edge_type=np.asarray(data.edge_type))
    norms = [rgcn_closure_norm(cl, 46) for cl in layers]
    lab = jnp.asarray(np.asarray(y)[train_idx]).astype(jnp.int32)
    lab_test = jnp.asarray(np.asarray(y)[test_idx]).astype(jnp.int32)
    test_j = jnp.asarray(test_idx)
    train_j = jnp.asarray(train_idx)
    n_train = train_idx.shape[0]
    full_norm = rgcn_norm(graph, graph.edge_type, 46)

    model = Net(num_nodes=graph.num_nodes, num_relations=46,
                num_classes=2)
    params0 = model.init(jax.random.PRNGKey(0), None, None, None,
                         closure=layers, norms=norms)
    tx = optax.adam(0.01)
    opt0 = tx.init(params0)

    def epoch_step(carry, _):
        params, opt = carry

        def loss_fn(p):
            logits = model.apply(p, None, None, None,
                                 closure=layers, norms=norms)
            logp = jax.nn.log_softmax(logits[:n_train])
            return -jnp.mean(
                jnp.take_along_axis(logp, lab[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt), loss

    @jax.jit
    def run(params, opt):
        def one(carry, i):
            acc, p_keep, o_keep = carry
            (p, o), losses = jax.lax.scan(epoch_step, (params, opt),
                                          None, length=epochs)
            return (acc + losses[-1] * (1.0 + 0.0 * i), p, o), None
        (acc, p, o), _ = jax.lax.scan(one, (0.0, params, opt),
                                      jnp.arange(K, dtype=jnp.float32))
        logits_full = model.apply(p, graph, None, full_norm)
        test_acc = jnp.mean((jnp.argmax(
            jnp.take(logits_full, test_j, axis=0), -1)
            == lab_test).astype(jnp.float32))
        logits_cl = model.apply(p, None, None, None, closure=layers,
                                norms=norms)[:n_train]
        gap = (jnp.max(jnp.abs(
            logits_cl - jnp.take(logits_full, train_j, axis=0)))
            / (1.0 + jnp.max(jnp.abs(logits_full))))
        return acc, test_acc, gap

    secs, (_, test_acc, gap) = time_program(run, params0, opt0)
    per = secs / K
    test_acc, gap = float(test_acc), float(gap)
    _, min_test_acc, syn = resolve_gates("mutag", "rgcn", ds, 0.0,
                                         min_test_acc)
    assert test_acc > min_test_acc, \
        f"rgcn test acc too low: {test_acc} (gate {min_test_acc}, " \
        f"synthetic={syn})"
    assert gap < 1e-2, f"closure/full logit gap {gap}"
    return emit(f"mutag_rgcn_{epochs}epoch_wallclock", per,
                BASELINES[("mutag", "rgcn")],
                {"test_acc": round(test_acc, 4),
                 "closure_full_logit_gap": gap, "K": K},
                synthetic=syn)


def bench_rgcn_fullgraph(epochs: int = 200, K: int = 4,
                         min_test_acc: float = 0.5):
    """FULL-GRAPH (non-closure) MUTAG-RDF RGCN through the fused
    table-SpMM with sorted-scatter backward (ops/embed_spmm.py) —
    the kernel-capability row (VERDICT round 1, item 2)."""
    import optax

    from examples.rgcn import Net
    from pytorch_geometric_tpu.data import from_data
    from pytorch_geometric_tpu.datasets import Entities
    from pytorch_geometric_tpu.nn.conv.rgcn_conv import (
        rgcn_fused_op, rgcn_norm)

    from pytorch_geometric_tpu.utils.reorder import rcm_permutation

    ds = Entities("datasets_cache_fullmutag", "MUTAG", scale=1.0)
    data = ds[0]
    # RCM relabel so the packed kernels' edge buckets are dense; index-
    # valued fields (train/test idx) are remapped through the inverse
    ei = np.asarray(data.edge_index)
    n_real = data.num_nodes
    perm = rcm_permutation(ei[0], ei[1], n_real)
    inv = np.empty(n_real, np.int64)
    inv[perm] = np.arange(n_real)
    data.edge_index = inv[ei]
    data.y = np.asarray(data.y)[perm]
    data.train_idx = inv[np.asarray(data.train_idx)]
    data.test_idx = inv[np.asarray(data.test_idx)]
    graph = from_data(data)
    et = graph.extras["edge_type"]
    norm = rgcn_norm(graph, et, 46)
    norm_np = np.asarray(norm)
    # (window=768, tile=192) won the tools/rgcn_sweep.py geometry scan:
    # low pack inflation (1.29) with 56% of the (1024, 256) one-hot
    # build cost — epoch 10.5 -> 8.5 ms
    fused_ops = (
        rgcn_fused_op(graph, et, 46, "embed",
                      in_channels=graph.num_nodes, norm=norm_np,
                      backend="packed", window=768, tile=192),
        rgcn_fused_op(graph, et, 46, "transform", norm=norm_np,
                      backend="packed", window=768, tile=192),
    )
    train_idx = jnp.asarray(np.asarray(data.train_idx))
    test_idx = jnp.asarray(np.asarray(data.test_idx))
    y = graph.y
    tm_np = np.zeros(graph.num_nodes, np.float32)
    tm_np[np.asarray(data.train_idx)] = 1.0
    train_mask = jnp.asarray(tm_np)
    n_train = float(tm_np.sum())
    model = Net(num_nodes=graph.num_nodes, num_relations=46,
                num_classes=2)
    params0 = model.init(jax.random.PRNGKey(0), graph, et, norm,
                         fused_ops=fused_ops)
    # bf16 BOTH moments (utils/optim.py): the Adam elementwise passes
    # over the 11.3M embed-layer params profiled at 0.89 ms/epoch-step
    # (HBM-bound); optax has no nu_dtype, adam_compact stores mu AND nu
    # bf16 (~40% less optimizer traffic, trajectory parity tested)
    from pytorch_geometric_tpu.utils.optim import adam_compact
    tx = adam_compact(0.01)
    opt0 = tx.init(params0)

    def epoch_step(carry, _):
        params, opt = carry

        def loss_fn(p):
            logits = model.apply(p, graph, et, norm,
                                 fused_ops=fused_ops)
            logp = jax.nn.log_softmax(logits)
            # full-lane mask/one-hot selection: the gather + 1-lane
            # take_along_axis pair profiled at ~230 us/epoch-step
            oh = (y[:, None] == jnp.arange(logp.shape[1])[None, :])
            nll = -jnp.sum(logp * oh.astype(logp.dtype), axis=1)
            return jnp.sum(nll * train_mask) / n_train

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt), loss

    @jax.jit
    def run(params, opt):
        def one(carry, i):
            acc, p_keep, o_keep = carry
            (p, o), losses = jax.lax.scan(epoch_step, (params, opt),
                                          None, length=epochs)
            return (acc + losses[-1] * (1.0 + 0.0 * i), p, o), None
        (acc, p, o), _ = jax.lax.scan(one, (0.0, params, opt),
                                      jnp.arange(K, dtype=jnp.float32))
        logits = model.apply(p, graph, et, norm, fused_ops=fused_ops)
        lab = jnp.take(y, test_idx).astype(jnp.int32)
        test_acc = jnp.mean((jnp.argmax(
            jnp.take(logits, test_idx, axis=0), -1)
            == lab).astype(jnp.float32))
        return acc, test_acc

    secs, (_, test_acc) = time_program(run, params0, opt0)
    per = secs / K
    test_acc = float(test_acc)
    _, min_test_acc, syn = resolve_gates("mutag", "rgcn", ds, 0.0,
                                         min_test_acc)
    assert test_acc > min_test_acc, \
        f"rgcn test acc too low: {test_acc} (gate {min_test_acc}, " \
        f"synthetic={syn})"
    return emit(f"mutag_rgcn_fullgraph_{epochs}epoch_wallclock", per,
                BASELINES[("mutag", "rgcn")],
                {"test_acc": round(test_acc, 4), "K": K,
                 "kernel": "packed_rgcn"},
                synthetic=syn)


def bench_pruning_pipeline(epochs: int = 100,
                           fine_tune_epochs: int = 100,
                           min_acc: float = 0.6):
    """The research pipeline end-to-end on the chip (VERDICT round 3,
    item 8): Cora GAT pre-train -> SVD width-prune -> rebuild ->
    fine-tune with periodic spectral weight correction — the reference
    TrainingNet flow (ConvexPruning.py:443-576), exercising the fused
    packed-GAT routing on TPU."""
    import shutil
    import tempfile

    from pytorch_geometric_tpu.research.driver import training_net

    tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        t0 = time.perf_counter()
        res = training_net(
            "Cora", "GAT", epochs=epochs,
            fine_tune_epochs=fine_tune_epochs, monte_size=1,
            results_dir=tmp, ckpt_dir=tmp)
        secs = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    best = float(res[0]["finetune_best"])
    assert best > min_acc, f"pipeline fine-tune acc too low: {best}"
    import os.path as _osp
    _syn = _osp.exists(_osp.join("datasets_cache", "Cora", "raw",
                                 "SYNTHETIC"))
    return emit("cora_pruning_pipeline_wallclock", secs, None, {
        "pretrain_best": round(float(res[0]["pretrain_best"]), 4),
        "finetune_best": round(best, 4),
        "widths": res[0]["widths"],
        "pruned_widths": res[0]["new_widths"],
        "epochs": epochs, "fine_tune_epochs": fine_tune_epochs,
        "note": "pre-train + SVD prune + rebuild + fine-tune with "
        "spectral weight correction (reference "
        "ConvexPruning.py:443-576); no reference wall-clock exists "
        "for this pipeline"}, synthetic=_syn)


def bench_reddit_sage_sampled(batch_size: int = 512,
                              max_batches: int = 20):
    """Neighbor-sampled Reddit SAGE (VERDICT round 3, item 9): the
    reference-analog inductive config (examples/ppi.py:11-16 /
    BASELINE north star).  Measures the C++ sampler throughput and the
    sampled-epoch wall-clock from examples/reddit_sage.py, with a
    loss-decrease gate."""
    import optax

    from examples.reddit_sage import SAGE
    from pytorch_geometric_tpu.data.neighbor_loader import (
        NeighborSampler)
    from pytorch_geometric_tpu.datasets import Reddit

    ds = Reddit("datasets_cache")
    data = ds[0]
    train_nodes = np.flatnonzero(data.train_mask)
    # index-shipping loader: features/labels stay DEVICE-RESIDENT; a
    # batch carries only int32 local->global ids (0.2 MB vs the 137 MB
    # padded feature matrix the materialized path re-transferred every
    # batch — measured 3.3 s/batch through the remote tunnel)
    # prefetch=4: a background thread runs the CSR walks and uploads
    # index batches while the device steps (host-pipelined sampling,
    # VERDICT round 4 item 3) — epoch ~ max(sampler, device), not sum
    loader = NeighborSampler(
        data.edge_index[0], data.edge_index[1], data.num_nodes,
        sizes=[10, 10], batch_size=batch_size,
        seed_nodes=train_nodes, seed=0, materialize_features=False,
        prefetch=4)
    # zero sentinel row appended: padding ids gather zeros, not node 0
    x_dev, y_dev = loader.device_tables(
        np.asarray(data.x, np.float32), np.asarray(data.y, np.int32))

    # sampler-only throughput (host pipeline, no device work)
    t0 = time.perf_counter()
    n_sampled = 0
    for i, g in enumerate(loader):
        if i >= max_batches:
            break
        n_sampled += int(g.num_nodes)
    sampler_s = time.perf_counter() - t0
    sampler_nodes_per_s = n_sampled / max(sampler_s, 1e-9)

    C = int(data.y.max()) + 1
    model = SAGE(hidden=128, num_classes=C)
    g0 = next(iter(loader))
    b0 = next(iter(loader.iter_packed()))
    params = model.init(jax.random.PRNGKey(0), g0,
                        jnp.take(x_dev, g0.extras["local_to_global"],
                                 axis=0))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, buf, x_dev, y_dev):
        # packed batch: ONE upload per batch, Graph rebuilt in-jit
        # (the ~8 per-leaf uploads cost ~3 ms of dispatch EACH through
        # the remote backend — they were the unhidden epoch cost)
        graph = loader.unpack(buf)
        ids = graph.extras["local_to_global"]
        x = jnp.take(x_dev, ids, axis=0)       # in-jit feature gather
        y = jnp.take(y_dev, ids)

        def loss_fn(p):
            logits = model.apply(p, graph, x)
            logp = jax.nn.log_softmax(logits)
            oh = (y[:, None] == jnp.arange(logp.shape[1])[None, :])
            nll = -jnp.sum(logp * oh.astype(logp.dtype), axis=1)
            m = graph.extras["seed_mask"].astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    # warm up the compile on the first bucket shape
    params, opt, l0 = train_step(params, opt, b0, x_dev, y_dev)
    float(l0)

    # device-only epoch: re-step pre-uploaded packed batches (no host
    # sampling or upload on the timed path) — the overlap denominator
    pre = []
    for i, buf in enumerate(loader.iter_packed()):
        if i >= max_batches:
            break
        pre.append(buf)
    t0 = time.perf_counter()
    p2, o2 = params, opt
    for buf in pre:
        p2, o2, loss = train_step(p2, o2, buf, x_dev, y_dev)
    float(loss)
    device_s = time.perf_counter() - t0

    # serial (prefetch=0) vs pipelined epochs, best-of-2 each — the
    # same-process A/B is robust to this VM's run-to-run noise, unlike
    # deriving overlap from separately-warmed component loops
    serial_loader = NeighborSampler(
        data.edge_index[0], data.edge_index[1], data.num_nodes,
        sizes=[10, 10], batch_size=batch_size,
        seed_nodes=train_nodes, seed=0, materialize_features=False)

    def epoch(ld, params, opt):
        losses = []
        t0 = time.perf_counter()
        for i, buf in enumerate(ld.iter_packed()):
            if i >= max_batches:
                break
            params, opt, loss = train_step(params, opt, buf, x_dev,
                                           y_dev)
            losses.append(loss)
        losses = [float(l) for l in losses]
        return time.perf_counter() - t0, losses, params, opt

    serial_s = float("inf")
    secs = float("inf")
    first_loss = None
    for _ in range(2):
        s1, l1, params, opt = epoch(serial_loader, params, opt)
        serial_s = min(serial_s, s1)
        if first_loss is None:
            first_loss = l1[0]
        s2, losses, params, opt = epoch(loader, params, opt)
        secs = min(secs, s2)
    # loss gate across the whole 4-epoch run (later epochs hover at
    # the converged level)
    assert losses[-1] < first_loss, \
        f"sampled SAGE loss did not decrease: {first_loss} -> " \
        f"{losses[-1]}"
    losses = [first_loss] + losses
    return emit("reddit_sage_sampled_epoch", secs, None, {
        "batches": len(losses), "batch_size": batch_size,
        "sampler_nodes_per_s": round(sampler_nodes_per_s, 0),
        "sampler_only_s": round(sampler_s, 3),
        "device_only_s": round(device_s, 3),
        "serial_epoch_s": round(serial_s, 3),
        "pipelined_vs_serial": round(serial_s / max(secs, 1e-9), 3),
        "prefetch": 4,
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "fanout": [10, 10],
        "n": int(data.num_nodes), "kernel": "C++ neighbor sampler + "
        "index-shipping batches, prefetch thread + bounded queue "
        "(host-pipelined) + in-jit device feature gather"},
        synthetic=dataset_is_synthetic(ds))


def run_scale_suite():
    """Reddit-scale rows (bench_scale.py) — the bandwidth-bound regime."""
    from bench_scale import run_scale_suite as _run
    return _run()


def run_headline_suite(epochs: int = 200, fullgraph: bool = True):
    """All 7 headline metrics (+ the full-graph kernel rows); returns
    the list of emitted records.  A failing row (gate assertion,
    transient TPU error) is reported as its own JSON line and skipped,
    so one bad row never destroys the rest of the evidence."""
    jobs = []
    for ds in ("cora", "citeseer", "pubmed"):
        jobs.append((bench_citation_gcn, (ds, epochs)))
        jobs.append((bench_citation_gat, (ds, epochs)))
    jobs.append((bench_rgcn, (epochs,)))
    if fullgraph:
        for ds in ("cora", "citeseer", "pubmed"):
            jobs.append((bench_citation_gcn_fullgraph, (ds, epochs)))
            jobs.append((bench_citation_gat_fullgraph, (ds, epochs)))
        jobs.append((bench_rgcn_fullgraph, (epochs,)))
    jobs.append((bench_pruning_pipeline, ()))
    jobs.append((bench_reddit_sage_sampled, ()))
    records = []
    for fn, args in jobs:
        try:
            records.append(fn(*args))
        except Exception as exc:  # noqa: BLE001 — report, keep going
            print(json.dumps({
                "metric": f"{fn.__name__}{args} ERROR",
                "error": f"{type(exc).__name__}: {exc}"}), flush=True)
    return records


if __name__ == "__main__":
    import argparse
    _p = argparse.ArgumentParser()
    _p.add_argument("--epochs", type=int, default=200)
    _a = _p.parse_args()
    run_headline_suite(epochs=_a.epochs)
