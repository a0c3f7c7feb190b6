"""Convex-pruning research pipeline driver.

Reference counterpart: ConvexPruning.py — ``TrainingNet`` (:443): dataset
dispatch -> ContractionLayerCoefficients widths -> model -> PHASE 1
pre-train (``TrainPart`` :47-95) -> ``RetainNetworkSize`` SVD width
pruning (:551) -> rebuild smaller net (:552-566) -> PHASE 2 fine-tune
with periodic ``WeightCorrection`` every 20 epochs past
StartTopoCoeffi * epochs (:58-64) -> best-metric checkpoints (:78-88)
-> per-Monte-Carlo ``.npy`` convergence curves under
Results/<dataset>Convergence (:569-576) -> CLI (:580-626).

TPU-first: the epoch loop is jitted (scan for the correction-free
stretches); weight correction runs host-side between scans, exactly the
host/device split of the reference (SURVEY §3.3).
"""

import argparse
import os
import os.path as osp
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets import (
    Amazon,
    CoraFull,
    Planetoid,
    Reddit,
)
from pytorch_geometric_tpu.models.citation import (
    masked_accuracy,
    masked_softmax_xent,
)
from pytorch_geometric_tpu.models.prunable import choose_model
from pytorch_geometric_tpu.research.checkpoint import CheckpointManager
from pytorch_geometric_tpu.research.pruning import (
    contraction_layer_coefficients,
    retain_network_size,
)
from pytorch_geometric_tpu.research.spectral import weight_correction
from pytorch_geometric_tpu.transforms import NormalizeFeatures


GRAPH_CLS_DATASETS = ("enzymes", "mutag", "proteins", "dd", "collab",
                      "mnist")


def load_citation_dataset(name: str, root: str = "datasets_cache"):
    """Dataset dispatch (reference :458-517 subset: citation-style)."""
    name_l = name.lower()
    if name_l in ("cora", "citeseer", "pubmed"):
        ds = Planetoid(root, name, transform=NormalizeFeatures())
    elif name_l == "corafull":
        ds = CoraFull(root)
    elif name_l in ("computers", "photo"):
        ds = Amazon(root, name_l)
    elif name_l == "reddit":
        ds = Reddit(root)
    else:
        raise ValueError(f"unsupported dataset {name}")
    data = ds[0]
    if getattr(data, "train_mask", None) is None:
        # datasets without canonical splits: random 60/20/20
        rng = np.random.default_rng(0)
        split = rng.random(data.num_nodes)
        data.train_mask = split < 0.6
        data.val_mask = (split >= 0.6) & (split < 0.8)
        data.test_mask = split >= 0.8
    return ds, from_data(data)


class TrainPartResult:
    def __init__(self, params, opt_state, train_conv, test_conv, best):
        self.params = params
        self.opt_state = opt_state
        self.train_convergence = train_conv
        self.test_convergence = test_conv
        self.best_acc = best


def train_part(model, graph, params, epochs: int, lr: float = 0.01,
               weight_decay: float = 5e-4, seed: int = 0,
               correction_epochs: Optional[Sequence[int]] = None,
               correction_kwargs: Optional[dict] = None,
               ckpt: Optional[CheckpointManager] = None,
               run_key: str = "run", monte: int = 0,
               apply_kwargs: Optional[dict] = None
               ) -> TrainPartResult:
    """One training phase (reference TrainPart :47-95): scan-jitted
    epochs, interrupted at ``correction_epochs`` for host-side spectral
    weight correction, checkpointing on best val accuracy.

    ``apply_kwargs`` are forwarded to every ``model.apply`` — e.g.
    ``{"flash_op": PackedFlashGat(...)}`` routes GAT layers through the
    fused Pallas attention backends."""
    ak = apply_kwargs or {}
    # global-norm clip: the randomly-contracted zoo reaches widths
    # >1000 (ContractionLayerCoefficients), where unclipped adamw at
    # lr=0.01 drives GAT logits past f32 exp range late in training
    # (the reference trains the same configs; its smaller defaults
    # masked this).  Clipping changes no stable run measurably.
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(lr, weight_decay=weight_decay))
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed + monte)

    def epoch_step(carry, _):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            logits = model.apply(p, graph, graph.x, train=True,
                                 rngs={"dropout": sub}, **ak)
            return masked_softmax_xent(logits, graph.y, graph.train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def run_span(params, opt_state, key, length):
        return jax.lax.scan(epoch_step, (params, opt_state, key), None,
                            length=length)

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, graph, graph.x, **ak)
        return (masked_accuracy(logits, graph.y, graph.train_mask),
                masked_accuracy(logits, graph.y, graph.val_mask),
                masked_accuracy(logits, graph.y, graph.test_mask))

    corrections = sorted(set(correction_epochs or []))
    spans = []
    prev = 0
    for c in corrections:
        if prev < c <= epochs:
            spans.append((c - prev, True))
            prev = c
    if prev < epochs:
        spans.append((epochs - prev, False))

    # one compiled scan length per phase: distinct span lengths each
    # recompile run_span (~1-3 min each on the remote backend — the
    # 100+100-epoch pipeline spent most of its 21 min compiling).
    # Chunk = gcd of span lengths when it is not degenerate; coprime
    # spans (e.g. 100 and 37) would collapse the gcd to 1 (one dispatch
    # per epoch — correct but dispatch-bound on the remote backend), so
    # fall back to chunk = min span length and run each span's
    # remainder as one extra compiled length (<= #spans + 1 compiled
    # scans total; ADVICE round 4).
    import math
    chunk = 0
    for length, _ in spans:
        chunk = math.gcd(chunk, length)
    min_span = min((length for length, _ in spans), default=1)
    if chunk < max(1, min_span // 4):
        chunk = min_span
    chunk = max(chunk, 1)

    train_conv: List[float] = []
    test_conv: List[float] = []
    best = 0.0
    for length, correct_after in spans:
        losses = []
        for _ in range(length // chunk):
            (params, opt_state, key), ls = run_span(
                params, opt_state, key, chunk)
            losses.append(np.asarray(ls))
        rem = length % chunk
        if rem:
            (params, opt_state, key), ls = run_span(
                params, opt_state, key, rem)
            losses.append(np.asarray(ls))
        losses = np.concatenate(losses) if losses else np.zeros(0)
        train_conv.extend(np.asarray(losses).tolist())
        tr, va, te = (float(v) for v in evaluate(params))
        test_conv.append(te)
        if ckpt is not None and ckpt.save_best(
                run_key, va, params, opt_state, train_conv, test_conv,
                epoch=len(train_conv)):
            pass
        best = max(best, va)
        if correct_after:
            params, applied = weight_correction(
                params, **(correction_kwargs or {"num_classes": 4}))
    return TrainPartResult(params, opt_state, train_conv, test_conv, best)


def train_part_graphcls(model, train_loader, test_loader, params,
                        epochs: int, lr: float = 5e-4, seed: int = 0,
                        ckpt: Optional[CheckpointManager] = None,
                        run_key: str = "run") -> TrainPartResult:
    """Graph-classification phase (the reference's TopKNet / batch-size
    sweep pipeline, ConvexPruningBatchSize.py): per-batch jitted steps
    over the bucketed loader."""
    import jax.numpy as jnp

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(params, opt_state, graph, key):
        def loss_fn(p):
            logits = model.apply(p, graph, train=True,
                                 rngs={"dropout": key})
            from pytorch_geometric_tpu.models.citation import (
                softmax_xent_int_labels)
            nll = softmax_xent_int_labels(logits, graph.y)
            m = graph.graph_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_batch(params, graph):
        logits = model.apply(params, graph)
        pred = jnp.argmax(logits, axis=1)
        m = graph.graph_mask
        return jnp.sum((pred == graph.y.astype(jnp.int32)) & m), \
            jnp.sum(m)

    train_conv, test_conv = [], []
    best = 0.0
    for epoch in range(epochs):
        losses = []
        for graph in train_loader:
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, graph, sub)
            losses.append(float(loss))
        train_conv.append(float(np.mean(losses)))
        cor = tot = 0
        for graph in test_loader:
            c, t = eval_batch(params, graph)
            cor, tot = cor + int(c), tot + int(t)
        acc = cor / max(tot, 1)
        test_conv.append(acc)
        best = max(best, acc)
        if ckpt is not None:
            ckpt.save_best(run_key, acc, params, opt_state, train_conv,
                           test_conv, epoch=epoch)
    return TrainPartResult(params, opt_state, train_conv, test_conv,
                           best)


def train_part_graphcls_dp(model, train_list_loader, test_loader, params,
                           epochs: int, num_devices: int,
                           num_nodes: int, num_edges: int,
                           graphs_per_shard: int, lr: float = 5e-4,
                           seed: int = 0,
                           ckpt: Optional[CheckpointManager] = None,
                           run_key: str = "run") -> TrainPartResult:
    """Multi-device graph-classification phase — the TPU-native
    counterpart of the reference running the pipeline under
    ``DataParallel(net)`` (ConvexPruning.py:530-531,559-560, exercised
    by run_ContractionCoefficientsChanges_2gpus.sh): each device gets a
    padded shard of the graph list, gradients ``psum`` over the ICI
    mesh axis (parallel/data_parallel.py), one compiled program."""
    from jax.sharding import Mesh

    from pytorch_geometric_tpu.parallel.data_parallel import (
        DataParallelTrainer,
        shard_data_list,
    )

    mesh = Mesh(np.asarray(jax.devices()[:num_devices]), ("dp",))

    def loss_fn(p, graph, rng):
        logits = model.apply(p, graph, train=True, rngs={"dropout": rng})
        from pytorch_geometric_tpu.models.citation import (
            softmax_xent_int_labels)
        nll = softmax_xent_int_labels(logits, graph.y)
        m = graph.graph_mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)

    trainer = DataParallelTrainer(mesh, loss_fn, optax.adam(lr))
    opt_state = trainer.init(params)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def eval_batch(params, graph):
        logits = model.apply(params, graph)
        pred = jnp.argmax(logits, axis=1)
        m = graph.graph_mask
        return jnp.sum((pred == graph.y.astype(jnp.int32)) & m), \
            jnp.sum(m)

    train_conv, test_conv = [], []
    best = 0.0
    for epoch in range(epochs):
        losses = []
        for data_list in train_list_loader:
            if len(data_list) < num_devices:   # tail smaller than mesh
                continue
            key, sub = jax.random.split(key)
            stacked = shard_data_list(data_list, num_devices,
                                      num_nodes, num_edges,
                                      graphs_per_shard)
            params, opt_state, loss = trainer.step(params, opt_state,
                                                   stacked, sub)
            losses.append(float(loss))
        train_conv.append(float(np.mean(losses)) if losses else 0.0)
        cor = tot = 0
        for graph in test_loader:
            c, t = eval_batch(params, graph)
            cor, tot = cor + int(c), tot + int(t)
        acc = cor / max(tot, 1)
        test_conv.append(acc)
        best = max(best, acc)
        if ckpt is not None:
            ckpt.save_best(run_key, acc, params, opt_state, train_conv,
                           test_conv, epoch=epoch)
    return TrainPartResult(params, opt_state, train_conv, test_conv,
                           best)


def training_net_graphcls(dataset: str, model_name: str = "TopK",
                          num_layers: int = 3, con_coeff: float = 0.6,
                          alpha: float = 0.5, epochs: int = 20,
                          fine_tune_epochs: int = 20,
                          batch_size: int = 64, lr: float = 5e-4,
                          monte_size: int = 1, seed: int = 0,
                          results_dir: str = "Results",
                          ckpt_dir: str = "checkpoint",
                          num_devices: int = 1):
    """Graph-classification pipeline (reference TUDataset dispatch at
    ConvexPruning.py:487 + the Batch_size sweep variant).

    ``num_devices > 1`` runs both phases data-parallel over a device
    mesh — the counterpart of the reference wrapping the net in
    ``DataParallel`` (ConvexPruning.py:530-531,559-560)."""
    from pytorch_geometric_tpu.data import DataListLoader, DataLoader
    from pytorch_geometric_tpu.data.batch import bucket_size
    from pytorch_geometric_tpu.datasets import MNISTSuperpixels, TUDataset

    if dataset.lower() == "mnist":
        # reference MNISTSuperpixels dispatch (ConvexPruning.py:515):
        # 75-node superpixel graphs with Cartesian edge pseudo-coords
        from pytorch_geometric_tpu.transforms import Cartesian
        ds = MNISTSuperpixels("datasets_cache", train=True,
                              transform=Cartesian())
    else:
        ds = TUDataset("datasets_cache", dataset.upper())
    num_classes = ds.num_classes
    ckpt = CheckpointManager(ckpt_dir)
    out_dir = osp.join(results_dir, f"{dataset.upper()}Convergence")
    os.makedirs(out_dir, exist_ok=True)
    if num_devices > 1:
        batch_size = max(batch_size // num_devices, 1) * num_devices
        gps = batch_size // num_devices           # graphs per shard
        sizes_n = sorted((d.num_nodes for d in ds), reverse=True)
        sizes_e = sorted((d.num_edges for d in ds), reverse=True)
        shard_nodes = bucket_size(sum(sizes_n[:gps]) + 1)
        shard_edges = bucket_size(max(sum(sizes_e[:gps]), 1))
    results = []
    for monte in range(monte_size):
        sh = ds.shuffle(seed=seed + monte)
        n = len(sh)
        test_ds, train_ds = sh[: n // 10], sh[n // 10:]
        train_loader = DataLoader(train_ds, batch_size=batch_size,
                                  shuffle=True, seed=seed + monte)
        test_loader = DataLoader(test_ds, batch_size=batch_size)
        widths = contraction_layer_coefficients(
            128, num_layers, alpha, seed=seed + monte)
        model = choose_model(model_name, widths, num_classes)
        g0 = next(iter(train_loader))
        key = jax.random.PRNGKey(seed + monte)
        params = model.init({"params": key, "dropout": key}, g0)
        run_key = (f"{dataset}-{model_name}{num_layers}-"
                   f"{'_'.join(map(str, widths))}-b{batch_size}-{monte}")

        if num_devices > 1:
            list_loader = DataListLoader(train_ds, batch_size=batch_size,
                                         shuffle=True, seed=seed + monte)

            def fit(mdl, prms, n_epochs, sd, rk):
                return train_part_graphcls_dp(
                    mdl, list_loader, test_loader, prms, n_epochs,
                    num_devices, shard_nodes, shard_edges, gps, lr=lr,
                    seed=sd, ckpt=ckpt, run_key=rk)
        else:
            def fit(mdl, prms, n_epochs, sd, rk):
                return train_part_graphcls(
                    mdl, train_loader, test_loader, prms, n_epochs,
                    lr=lr, seed=sd, ckpt=ckpt, run_key=rk)

        phase1 = fit(model, params, epochs, seed, run_key + "-p1")
        new_widths = [max(int(w), 2) for w in
                      retain_network_size(phase1.params, con_coeff)
                      [:num_layers]] or widths
        pruned = choose_model(model_name, new_widths, num_classes)
        key2 = jax.random.PRNGKey(seed + monte + 1)
        p2 = pruned.init({"params": key2, "dropout": key2}, g0)
        phase2 = fit(pruned, p2, fine_tune_epochs, seed + 1,
                     run_key + "-p2")
        tag = f"param_{'_'.join(map(str, widths))}_{con_coeff}_b{batch_size}"
        np.save(osp.join(out_dir, f"TrainConvergence-{dataset.upper()}-"
                                  f"{model_name}{num_layers}-{tag}-"
                                  f"monte_{monte}.npy"),
                np.asarray(phase2.train_convergence))
        np.save(osp.join(out_dir, f"TestConvergence-{dataset.upper()}-"
                                  f"{model_name}{num_layers}-{tag}-"
                                  f"monte_{monte}.npy"),
                np.asarray(phase2.test_convergence))
        results.append({"monte": monte, "widths": widths,
                        "new_widths": new_widths,
                        "pretrain_best": phase1.best_acc,
                        "finetune_best": phase2.best_acc})
    return results


def training_net_ppi(model_name: str = "GCN", num_layers: int = 2,
                     con_coeff: float = 0.6, alpha: float = 0.5,
                     epochs: int = 20, fine_tune_epochs: int = 20,
                     batch_size: int = 2, lr: float = 5e-3,
                     monte_size: int = 1, seed: int = 0,
                     results_dir: str = "Results",
                     ckpt_dir: str = "checkpoint"):
    """PPI pipeline (reference dispatch ConvexPruning.py:492-501):
    inductive multi-label node classification over the 20/2/2 graph
    split with BCE-with-logits loss and micro-F1 eval, run through the
    same two-phase prune/fine-tune loop as the citation pipeline."""
    from pytorch_geometric_tpu.data import DataLoader
    from pytorch_geometric_tpu.datasets import PPI

    train_ds = PPI("datasets_cache", split="train")
    test_ds = PPI("datasets_cache", split="test")
    num_classes = train_ds.num_classes
    ckpt = CheckpointManager(ckpt_dir)
    out_dir = osp.join(results_dir, "PPIConvergence")
    os.makedirs(out_dir, exist_ok=True)

    def bce_loss(model):
        def loss_fn(p, graph, rng):
            logits = model.apply(p, graph, graph.x, train=True,
                                 rngs={"dropout": rng})
            y = graph.y.astype(jnp.float32)              # (N, C) multi
            per = optax.sigmoid_binary_cross_entropy(logits, y)
            m = graph.real_node_mask().astype(jnp.float32)[:, None]
            return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * y.shape[1],
                                                  1.0)
        return loss_fn

    def fit(model, params, n_epochs, sd, rk):
        tx = optax.adam(lr)
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(sd)
        loss_fn = bce_loss(model)

        @jax.jit
        def step(params, opt_state, graph, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, graph, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_batch(params, graph):
            logits = model.apply(params, graph, graph.x)
            pred = logits > 0
            y = graph.y > 0.5
            m = graph.real_node_mask()[:, None]
            tp = jnp.sum(pred & y & m)
            fp = jnp.sum(pred & ~y & m)
            fn = jnp.sum(~pred & y & m)
            return tp, fp, fn

        train_loader = DataLoader(train_ds, batch_size=batch_size,
                                  shuffle=True, seed=sd)
        test_loader = DataLoader(test_ds, batch_size=batch_size)
        train_conv, test_conv, best = [], [], 0.0
        for _ in range(n_epochs):
            losses = []
            for graph in train_loader:
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, graph,
                                               sub)
                losses.append(float(loss))
            train_conv.append(float(np.mean(losses)))
            tp = fp = fn = 0
            for graph in test_loader:
                a, b, c = eval_batch(params, graph)
                tp, fp, fn = tp + int(a), fp + int(b), fn + int(c)
            f1 = 2 * tp / max(2 * tp + fp + fn, 1)       # micro-F1
            test_conv.append(f1)
            best = max(best, f1)
            ckpt.save_best(rk, f1, params, opt_state, train_conv,
                           test_conv, epoch=len(train_conv))
        return TrainPartResult(params, opt_state, train_conv, test_conv,
                               best)

    results = []
    for monte in range(monte_size):
        widths = contraction_layer_coefficients(
            train_ds[0].x.shape[1], num_layers, alpha, seed=seed + monte)
        model = choose_model(model_name, widths, num_classes)
        g0 = next(iter(DataLoader(train_ds, batch_size=batch_size)))
        key = jax.random.PRNGKey(seed + monte)
        params = model.init({"params": key, "dropout": key}, g0, g0.x)
        run_key = (f"PPI-{model_name}{num_layers}-"
                   f"{'_'.join(map(str, widths))}-{monte}")
        phase1 = fit(model, params, epochs, seed + monte,
                     run_key + "-p1")
        new_widths = [max(int(w), 2) for w in
                      retain_network_size(phase1.params, con_coeff)
                      [:num_layers]] or widths
        pruned = choose_model(model_name, new_widths, num_classes)
        key2 = jax.random.PRNGKey(seed + monte + 1)
        p2 = pruned.init({"params": key2, "dropout": key2}, g0, g0.x)
        phase2 = fit(pruned, p2, fine_tune_epochs, seed + monte + 1,
                     run_key + "-p2")
        tag = f"param_{'_'.join(map(str, widths))}_{con_coeff}"
        np.save(osp.join(out_dir, f"TrainConvergence-PPI-"
                                  f"{model_name}{num_layers}-{tag}-"
                                  f"monte_{monte}.npy"),
                np.asarray(phase2.train_convergence))
        np.save(osp.join(out_dir, f"TestConvergence-PPI-"
                                  f"{model_name}{num_layers}-{tag}-"
                                  f"monte_{monte}.npy"),
                np.asarray(phase2.test_convergence))
        results.append({"monte": monte, "widths": widths,
                        "new_widths": new_widths,
                        "pretrain_best": phase1.best_acc,
                        "finetune_best": phase2.best_acc})
    return results


def training_net(dataset: str = "Cora", model_name: str = "GCN",
                 num_layers: int = 2, con_coeff: float = 0.6,
                 alpha: float = 0.5, epochs: int = 100,
                 fine_tune_epochs: int = 100, lr: float = 0.01,
                 start_topo_coeff: float = 0.5, vector_pairs: int = 2,
                 correction_coeff: float = 0.001,
                 link_prediction_method: str = "resource_allocation_index",
                 monte_size: int = 1, seed: int = 0,
                 results_dir: str = "Results", resume: bool = False,
                 ckpt_dir: str = "checkpoint",
                 fused_gat: Optional[bool] = None):
    """The full pipeline (reference TrainingNet :443-576 + Monte loop
    :452).  Saves Train/Test convergence .npy files keyed by
    hyperparameters, like the reference's filename registry (:569-576).

    ``fused_gat``: route GAT layers through the fused Pallas attention
    backend (ops/packed_gat.py).  Default (None) enables it on a real
    TPU backend only — the interpret-mode fallback is correct but slow.
    """
    ds, graph = load_citation_dataset(dataset)
    num_classes = ds.num_classes
    ckpt = CheckpointManager(ckpt_dir)
    out_dir = osp.join(results_dir, f"{dataset}Convergence")
    os.makedirs(out_dir, exist_ok=True)
    results = []

    apply_kwargs = {}
    if model_name == "GAT":
        if fused_gat is None:
            fused_gat = jax.default_backend() == "tpu"
        if fused_gat:
            from pytorch_geometric_tpu.ops.packed_gat import (
                PackedFlashGat)
            emask = np.asarray(graph.real_edge_mask())
            send = np.asarray(graph.senders)[emask]
            recv = np.asarray(graph.receivers)[emask]
            loops = np.arange(graph.num_nodes)
            keep = send != recv     # PyG 1.4: remove then re-add loops
            apply_kwargs["flash_op"] = PackedFlashGat(
                senders=np.concatenate([send[keep], loops]),
                receivers=np.concatenate([recv[keep], loops]),
                num_nodes=graph.num_nodes, window=1024, tile=256)

    for monte in range(monte_size):
        widths = contraction_layer_coefficients(
            graph.num_node_features, num_layers, alpha, seed=seed + monte)
        model = choose_model(model_name, widths, num_classes)
        key = jax.random.PRNGKey(seed + monte)
        params = model.init({"params": key, "dropout": key}, graph,
                            graph.x, **apply_kwargs)
        run_key = (f"{dataset}-{model_name}{num_layers}-"
                   f"{'_'.join(map(str, widths))}-{con_coeff}-{monte}")
        if resume:
            restored = ckpt.resume(run_key)
            if restored is not None:
                params = restored[0]

        # PHASE 1: pre-train
        phase1 = train_part(model, graph, params, epochs, lr=lr,
                            seed=seed, ckpt=ckpt,
                            run_key=run_key + "-phase1", monte=monte,
                            apply_kwargs=apply_kwargs)

        # SVD width pruning -> rebuild smaller net
        new_widths = retain_network_size(phase1.params, con_coeff)
        new_widths = [max(int(w), 1) for w in new_widths[:num_layers]] \
            or widths
        pruned_model = choose_model(model_name, new_widths, num_classes)
        key2 = jax.random.PRNGKey(seed + monte + 1)
        pruned_params = pruned_model.init(
            {"params": key2, "dropout": key2}, graph, graph.x,
            **apply_kwargs)

        # PHASE 2: fine-tune with periodic spectral weight correction
        start = int(start_topo_coeff * fine_tune_epochs)
        corrections = list(range(start + 20, fine_tune_epochs, 20))
        phase2 = train_part(
            pruned_model, graph, pruned_params, fine_tune_epochs, lr=lr,
            seed=seed + 1, ckpt=ckpt, run_key=run_key + "-phase2",
            monte=monte,
            correction_epochs=corrections,
            correction_kwargs=dict(
                num_classes=num_classes,
                method=link_prediction_method,
                vector_pairs=vector_pairs,
                correction_coeff=correction_coeff),
            apply_kwargs=apply_kwargs)

        params_tag = f"param_{'_'.join(map(str, widths))}_{con_coeff}"
        np.save(osp.join(
            out_dir,
            f"TrainConvergence-{dataset}-{model_name}{num_layers}-"
            f"{params_tag}-monte_{monte}.npy"),
            np.asarray(phase2.train_convergence))
        np.save(osp.join(
            out_dir,
            f"TestConvergence-{dataset}-{model_name}{num_layers}-"
            f"{params_tag}-monte_{monte}.npy"),
            np.asarray(phase2.test_convergence))
        results.append({
            "monte": monte, "widths": widths, "new_widths": new_widths,
            "pretrain_best": phase1.best_acc,
            "finetune_best": phase2.best_acc,
        })
    return results


def training_net_partitioned(dataset: str = "Cora",
                             model_name: str = "GCN",
                             num_devices: int = 1, epochs: int = 100,
                             lr: float = 0.01, seed: int = 0,
                             results_dir: str = "Results"):
    """Edge-partitioned (graph-parallel) citation training through the
    public distributed nn API (parallel/api.py GraphPartition +
    parallel/models.py Dist*) — the scale-out path for graphs larger
    than one chip.  The reference has only DataParallel
    (ConvexPruning.py:530); this is the TPU-native analog (SURVEY §2d
    edge-partition mapping), exposed via the driver's ``--partition``
    flag."""
    import optax

    from pytorch_geometric_tpu.parallel.api import GraphPartition
    from pytorch_geometric_tpu.parallel.models import (
        DistGAT,
        DistGCN,
        DistSAGE,
    )

    ds, graph = load_citation_dataset(dataset)
    C = ds.num_classes
    emask = np.asarray(graph.real_edge_mask())
    s = np.asarray(graph.senders)[emask]
    r = np.asarray(graph.receivers)[emask]
    keep = s != r                  # GraphPartition appends self loops
    N = graph.num_nodes
    part = GraphPartition(s[keep], r[keep], N, num_devices)
    models = {
        "GCN": lambda: DistGCN(hidden_channels=16, num_classes=C),
        "SAGE": lambda: DistSAGE(hidden_channels=16, num_classes=C),
        "GAT": lambda: DistGAT(num_classes=C),
    }
    if model_name not in models:
        raise ValueError(
            f"--partition supports GCN/SAGE/GAT, got {model_name}")
    model = models[model_name]()
    has_rng = model_name == "GCN"   # dropout layers
    x_sh = part.shard_nodes(np.asarray(graph.x))
    y_sh = part.shard_nodes(np.asarray(graph.y))
    m_sh = part.shard_nodes(
        np.asarray(graph.train_mask).astype(np.float32))
    params = model_init = part.init_model(
        model, x_sh, jax.random.PRNGKey(seed), has_rng=has_rng)
    del model_init
    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(logits, y_l, m_l):
        logp = jax.nn.log_softmax(logits)
        oh = (y_l[:, None] == jnp.arange(C)[None, :])
        nll = -jnp.sum(logp * oh.astype(logp.dtype), axis=1)
        return jnp.sum(nll * m_l), jnp.sum(m_l)

    step = part.make_train_step(model, tx, loss_fn, has_rng=has_rng)
    losses = []
    key = jax.random.PRNGKey(seed + 1)
    for i in range(epochs):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x_sh, y_sh, m_sh, sub)
        losses.append(float(loss))
    logits = part.unshard_nodes(part.apply_model(model, params, x_sh))
    pred = np.argmax(logits, axis=1)
    y = np.asarray(graph.y)

    def acc(mask):
        m = np.asarray(mask).astype(bool)
        return float((pred[m] == y[m]).mean()) if m.any() else 0.0

    result = {
        "dataset": dataset, "model": model_name,
        "num_devices": num_devices, "epochs": epochs,
        "loss_first": losses[0], "loss_last": losses[-1],
        "val_acc": acc(graph.val_mask),
        "test_acc": acc(graph.test_mask),
    }
    return result


def main(argv=None):
    """CLI mirroring the reference's flags (ConvexPruning.py:580-611)."""
    p = argparse.ArgumentParser(description="Convex pruning pipeline")
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--modelName", default="GCN")
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--ConCoeff", type=float, default=0.6)
    p.add_argument("--CutoffCoeff", type=float, default=0.5, dest="alpha")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--fine_tune_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--StartTopoCoeffi", type=float, default=0.5)
    p.add_argument("--VectorPairs", type=int, default=2)
    p.add_argument("--WeightCorrectionCoeffi", type=float, default=0.001)
    p.add_argument("--LinkPredictionMethod",
                   default="resource_allocation_index")
    p.add_argument("--MonteSize", type=int, default=1)
    p.add_argument("--Batch_size", type=int, default=64)
    p.add_argument("--gpus", type=int, default=1, dest="num_devices",
                   help="device count for data-parallel training "
                        "(mirrors the reference's --gpus flag; here "
                        "TPU chips / mesh devices)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", "-r", action="store_true")
    p.add_argument("--savepath", default="Results")
    p.add_argument("--partition", type=int, default=0,
                   help="train edge-partitioned (graph-parallel) over "
                        "this many mesh devices through the "
                        "distributed nn API (GraphPartition + "
                        "DistGCN/DistSAGE/DistGAT); 0 = off")
    args = p.parse_args(argv)
    if args.partition:
        res = training_net_partitioned(
            dataset=args.dataset, model_name=args.modelName,
            num_devices=args.partition, epochs=args.epochs,
            lr=args.lr, seed=args.seed, results_dir=args.savepath)
        print(res)
        return
    if args.dataset.lower() == "ppi":
        res = training_net_ppi(
            model_name=args.modelName, num_layers=args.num_layers,
            con_coeff=args.ConCoeff, alpha=args.alpha,
            epochs=args.epochs, fine_tune_epochs=args.fine_tune_epochs,
            batch_size=max(args.Batch_size, 1), monte_size=args.MonteSize,
            seed=args.seed, results_dir=args.savepath)
        for r in res:
            print(r)
        return
    if args.dataset.lower() in GRAPH_CLS_DATASETS:
        res = training_net_graphcls(
            dataset=args.dataset,
            model_name=args.modelName if args.modelName != "GCN"
            else "TopK",
            num_layers=args.num_layers, con_coeff=args.ConCoeff,
            alpha=args.alpha, epochs=args.epochs,
            fine_tune_epochs=args.fine_tune_epochs,
            batch_size=args.Batch_size, monte_size=args.MonteSize,
            seed=args.seed, results_dir=args.savepath,
            num_devices=args.num_devices)
        for r in res:
            print(r)
        return
    res = training_net(
        dataset=args.dataset, model_name=args.modelName,
        num_layers=args.num_layers, con_coeff=args.ConCoeff,
        alpha=args.alpha, epochs=args.epochs,
        fine_tune_epochs=args.fine_tune_epochs, lr=args.lr,
        start_topo_coeff=args.StartTopoCoeffi,
        vector_pairs=args.VectorPairs,
        correction_coeff=args.WeightCorrectionCoeffi,
        link_prediction_method=args.LinkPredictionMethod,
        monte_size=args.MonteSize, seed=args.seed,
        results_dir=args.savepath, resume=args.resume)
    for r in res:
        print(r)


if __name__ == "__main__":
    main()
