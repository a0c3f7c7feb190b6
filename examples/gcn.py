"""GCN on Cora — mirror of the reference's examples/gcn.py (2-layer GCN,
hidden 16, dropout 0.5, Adam lr 0.01 + wd 5e-4 on layer 1, 200 epochs,
per-epoch train/val/test accuracy).  TPU-first: all epochs in one
lax.scan under a single jit."""

import argparse

import numpy as np

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets import Planetoid
from pytorch_geometric_tpu.models.citation import train_gcn
from pytorch_geometric_tpu.transforms import NormalizeFeatures


def run(dataset_name: str = "Cora", epochs: int = 200, seed: int = 0):
    ds = Planetoid("datasets_cache", dataset_name,
                   transform=NormalizeFeatures())
    graph = from_data(ds[0])
    params, metrics = train_gcn(graph, num_classes=ds.num_classes,
                                epochs=epochs, seed=seed)
    curve = np.asarray(metrics["curve"]["loss"])
    for e in range(0, epochs, max(epochs // 10, 1)):
        print(f"Epoch {e:03d}  loss {curve[e]:.4f}")
    print(f"Train: {float(metrics['train_acc']):.4f}, "
          f"Val: {float(metrics['val_acc']):.4f}, "
          f"Test: {float(metrics['test_acc']):.4f}")
    return metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--epochs", type=int, default=200)
    args = p.parse_args()
    run(args.dataset, args.epochs)
