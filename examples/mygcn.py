"""Standalone resumable GCN — mirror of the reference's
examples/MyGCN.py (:39-47): checkpoint on best validation accuracy,
``--resume`` restores net + optimiser + convergence history AND the
epoch counter, then continues training from there.
"""

import argparse

import jax
import numpy as np

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets import Planetoid
from pytorch_geometric_tpu.models.citation import (
    GCN,
    create_gcn_train_step,
)
from pytorch_geometric_tpu.research.checkpoint import CheckpointManager
from pytorch_geometric_tpu.transforms import NormalizeFeatures


def run(dataset: str = "Cora", epochs: int = 60, resume: bool = False,
        seed: int = 0, ckpt_dir: str = "checkpoint",
        span: int = 20):
    ds = Planetoid("datasets_cache", dataset,
                   transform=NormalizeFeatures())
    graph = from_data(ds[0])
    model = GCN(hidden_channels=16, num_classes=ds.num_classes)
    init_fn, epoch_step, eval_fn = create_gcn_train_step(model, graph)
    key = jax.random.PRNGKey(seed)
    params, opt_state = init_fn(key)
    ckpt = CheckpointManager(ckpt_dir)
    run_key = f"mygcn-{dataset}"

    start_epoch = 0
    history = []
    if resume:
        restored = ckpt.resume(run_key)
        if restored is not None:
            params, opt_state, train_conv, _, metric, ep = restored
            history = list(train_conv or [])
            start_epoch = int(ep or 0)
            print(f"=> resumed from epoch {start_epoch} "
                  f"(best val {metric:.4f})")

    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def run_span(params, opt_state, key, length):
        return jax.lax.scan(epoch_step, (params, opt_state, key), None,
                            length=length)

    evaluate = jax.jit(eval_fn)
    epoch = start_epoch
    while epoch < epochs:
        length = min(span, epochs - epoch)
        (params, opt_state, key), metrics = run_span(
            params, opt_state, key, length)
        history.extend(np.asarray(metrics["loss"]).tolist())
        epoch += length
        ev = {k: float(v) for k, v in evaluate(params).items()}
        ckpt.save_best(run_key, ev["val_acc"], params, opt_state,
                       history, [ev["test_acc"]], epoch=epoch)
        print(f"Epoch {epoch:03d}  loss {history[-1]:.4f}  "
              f"val {ev['val_acc']:.4f}  test {ev['test_acc']:.4f}")
    return evaluate(params)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--resume", "-r", action="store_true")
    args = p.parse_args()
    run(args.dataset, args.epochs, args.resume)
