"""Citation-network models: the reference's canonical workload.

Mirrors ``examples/gcn.py`` of the reference (2-layer GCN, hidden 16,
dropout 0.5, Adam lr 0.01 with weight decay 5e-4 on the first layer,
200 epochs full-batch on Cora) — reference examples/gcn.py:15-40.

TPU-first training loop: the *entire* multi-epoch loop runs on device as
one ``lax.scan`` under a single jit — zero host round-trips per epoch,
versus the reference's per-epoch Python loop.  That is the main reason the
200-epoch wall-clock target (BASELINE.md: 0.25 s on a GTX 1080Ti) is
beatable: the graph is static, so XLA fuses each epoch into a handful of
kernels and the scan replays them.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.conv.gcn_conv import GCNConv, gcn_norm


class GCN(nn.Module):
    """2-layer GCN for transductive node classification."""

    hidden_channels: int
    num_classes: int
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, graph: Graph, x, norm=None, *, train: bool = False,
                 norm_dense=None, aggregate_fn=None, closure=None,
                 closure_norms=None):
        if closure is not None:
            # layered training-closure mode: x holds features for the
            # first layer's input nodes only (data/closure.py)
            x = nn.Dropout(self.dropout_rate,
                           deterministic=not train)(x)
            x = GCNConv(self.hidden_channels, name="conv1")(
                None, x, norm=closure_norms[0], closure=closure[0])
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate,
                           deterministic=not train)(x)
            return GCNConv(self.num_classes, name="conv2")(
                None, x, norm=closure_norms[1], closure=closure[1])
        if norm is None and norm_dense is None and aggregate_fn is None:
            norm = gcn_norm(graph)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = GCNConv(self.hidden_channels, name="conv1")(
            graph, x, norm=norm, norm_dense=norm_dense,
            aggregate_fn=aggregate_fn)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = GCNConv(self.num_classes, name="conv2")(
            graph, x, norm=norm, norm_dense=norm_dense,
            aggregate_fn=aggregate_fn)
        return x  # logits; log_softmax applied in the loss


def softmax_xent_int_labels(logits, labels):
    """Mean NLL with integer labels via a full-lane one-hot select
    (take_along_axis runs as a 1-lane gather pass on TPU)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = (labels[:, None].astype(jnp.int32)
              == jnp.arange(logits.shape[-1])[None, :])
    return -jnp.sum(logp * onehot.astype(logp.dtype), axis=-1)


def masked_softmax_xent(logits, labels, mask):
    nll = softmax_xent_int_labels(logits, labels)
    m = mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_accuracy(logits, labels, mask):
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == labels) * m) / jnp.maximum(jnp.sum(m), 1.0)


def create_gcn_train_step(model: GCN, graph: Graph, weight_decay=5e-4,
                          lr=0.01, dense: bool = False,
                          dense_dtype=jnp.bfloat16,
                          pallas: bool = False, window: int = 512,
                          tile: int = 512, closure: bool = False):
    """Build (init_fn, epoch_step, eval_fn) closures over a static graph.

    ``epoch_step`` is scan-compatible: carry = (params, opt_state, key).
    Weight decay applies to the first layer only, matching the reference's
    per-group Adam config (examples/gcn.py:31-34).

    Aggregation backends: default XLA segment path; ``dense=True`` — the
    precomputed dense normalised adjacency (bf16 MXU matmuls; fastest
    for small padded graphs, N^2 memory); ``pallas=True`` — the windowed
    one-hot kernel with the static norm weights pre-packed (no per-edge
    gathers on the hot path; for graphs past the dense-memory limit).
    """
    from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm_dense

    if closure:
        return _create_gcn_closure_train_step(model, graph,
                                              weight_decay, lr)
    aggregate_fn = None
    norm_dense = None
    norm = None
    if dense:
        norm_dense = gcn_norm_dense(graph, dtype=dense_dtype)
    elif pallas:
        import numpy as np

        from pytorch_geometric_tpu.ops.hybrid_spmm import HybridSpmm

        full_norm = gcn_norm(graph)
        # hybrid dense-bucket SpMM: the honest-timing winner
        # (5.8 ns/edge vs XLA's 10.7 on clustered graphs — PERF.md)
        op = HybridSpmm(np.asarray(full_norm.senders),
                        np.asarray(full_norm.receivers),
                        graph.num_nodes, window=window, tile=tile)
        norm_w = full_norm.weights

        def aggregate_fn(h):
            return op(norm_w, h)
    else:
        norm = gcn_norm(graph)
    tx = optax.adam(lr)

    def init_fn(key):
        params = model.init({"params": key}, graph, graph.x, norm,
                            norm_dense=norm_dense,
                            aggregate_fn=aggregate_fn)
        return params, tx.init(params)

    def loss_fn(params, key):
        logits = model.apply(params, graph, graph.x, norm, train=True,
                             norm_dense=norm_dense,
                             aggregate_fn=aggregate_fn,
                             rngs={"dropout": key})
        loss = masked_softmax_xent(logits, graph.y, graph.train_mask)
        wd = sum(jnp.sum(p ** 2) for p in
                 jax.tree_util.tree_leaves(params["params"]["conv1"]))
        return loss + weight_decay * wd, logits

    def epoch_step(carry, _):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "train_acc": masked_accuracy(logits, graph.y, graph.train_mask),
        }
        return (params, opt_state, key), metrics

    def eval_fn(params):
        logits = model.apply(params, graph, graph.x, norm, train=False,
                             norm_dense=norm_dense,
                             aggregate_fn=aggregate_fn)
        return {
            "train_acc": masked_accuracy(logits, graph.y, graph.train_mask),
            "val_acc": masked_accuracy(logits, graph.y, graph.val_mask),
            "test_acc": masked_accuracy(logits, graph.y, graph.test_mask),
        }

    return init_fn, epoch_step, eval_fn


def _create_gcn_closure_train_step(model: GCN, graph: Graph,
                                   weight_decay=5e-4, lr=0.01):
    """Training-closure variant: per-epoch work is the 2-layer
    receptive field of the labelled nodes (gradient-identical to
    full-graph training up to dropout RNG — data/closure.py), which is
    ~100x fewer edges on Planetoid splits.  Eval stays full-graph.
    """
    import numpy as np

    from pytorch_geometric_tpu.data.closure import (
        layered_training_closure)
    from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_closure_norm

    emask = np.asarray(graph.real_edge_mask())
    ei = np.stack([np.asarray(graph.senders)[emask],
                   np.asarray(graph.receivers)[emask]])
    seeds = np.flatnonzero(np.asarray(graph.train_mask))
    layers = layered_training_closure(ei, seeds, 2,
                                      num_nodes=graph.num_nodes)
    closure_norms = gcn_closure_norm(ei, graph.num_nodes, layers)
    x0 = jnp.take(graph.x, layers[0].in_global, axis=0)
    labels = jnp.asarray(np.asarray(graph.y)[seeds])
    n_train = seeds.shape[0]
    tx = optax.adam(lr)

    def init_fn(key):
        params = model.init({"params": key}, None, x0,
                            closure=layers, closure_norms=closure_norms)
        return params, tx.init(params)

    def loss_fn(params, key):
        logits = model.apply(params, None, x0, train=True,
                             closure=layers,
                             closure_norms=closure_norms,
                             rngs={"dropout": key})[:n_train]
        loss = jnp.mean(softmax_xent_int_labels(logits, labels))
        wd = sum(jnp.sum(p ** 2) for p in
                 jax.tree_util.tree_leaves(params["params"]["conv1"]))
        return loss + weight_decay * wd, logits

    def epoch_step(carry, _):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "train_acc": jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)),
        }
        return (params, opt_state, key), metrics

    norm = gcn_norm(graph)

    def eval_fn(params):
        logits = model.apply(params, graph, graph.x, norm, train=False)
        return {
            "train_acc": masked_accuracy(logits, graph.y,
                                         graph.train_mask),
            "val_acc": masked_accuracy(logits, graph.y, graph.val_mask),
            "test_acc": masked_accuracy(logits, graph.y,
                                        graph.test_mask),
        }

    return init_fn, epoch_step, eval_fn


def train_gcn(graph: Graph, num_classes: int, hidden: int = 16,
              epochs: int = 200, seed: int = 0,
              lr: float = 0.01) -> Tuple[Any, dict]:
    """Full training run: one jit, one device program, ``epochs`` steps."""
    model = GCN(hidden_channels=hidden, num_classes=num_classes)
    init_fn, epoch_step, eval_fn = create_gcn_train_step(model, graph,
                                                         lr=lr)
    key = jax.random.PRNGKey(seed)
    params, opt_state = init_fn(key)

    @jax.jit
    def run(params, opt_state, key):
        (params, opt_state, _), metrics = jax.lax.scan(
            epoch_step, (params, opt_state, key), None, length=epochs)
        return params, opt_state, metrics

    params, opt_state, metrics = run(params, opt_state, key)
    final = jax.jit(eval_fn)(params)
    return params, {**{k: v for k, v in final.items()},
                    "curve": metrics}
