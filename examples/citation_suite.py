"""Compact mirrors of the reference's small citation examples:
sgc.py (SGConv K=2 cached), agnn.py (AGNN propagation layers),
arma.py (ARMAConv stacks), cora.py (SplineConv + TargetIndegree),
dna.py (DNAConv over layer history).

Each trains full-batch on (synthetic-fallback) Planetoid with the
reference's hyperparameters; the epoch loop is one lax.scan jit.
"""

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets import Planetoid
from pytorch_geometric_tpu.models.citation import (
    masked_accuracy,
    masked_softmax_xent,
)
from pytorch_geometric_tpu.nn.conv import (
    AGNNConv,
    ARMAConv,
    DNAConv,
    SGConv,
    SplineConv,
)
from pytorch_geometric_tpu.transforms import (
    NormalizeFeatures,
    TargetIndegree,
)


class SGCNet(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, graph, x, *, train: bool = False):
        return SGConv(self.num_classes, K=2)(graph, x)


class AGNNNet(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, graph, x, *, train: bool = False):
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(16)(x))
        x = AGNNConv(requires_grad=False)(graph, x)
        x = AGNNConv(requires_grad=True)(graph, x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


class ARMANet(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, graph, x, *, train: bool = False):
        x = ARMAConv(16, num_stacks=3, num_layers=2,
                     shared_weights=True, dropout=0.25)(
            graph, x, train=train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = ARMAConv(self.num_classes, num_stacks=3, num_layers=2,
                     shared_weights=True, dropout=0.25,
                     act=lambda v: v)(graph, x, train=train)
        return x


class SplineNet(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, graph, x, *, train: bool = False):
        x = SplineConv(16, dim=1, kernel_size=2)(graph, x)
        x = nn.elu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = SplineConv(self.num_classes, dim=1, kernel_size=2)(graph, x)
        return x


class DNANet(nn.Module):
    num_classes: int
    hidden: int = 128
    num_layers: int = 4
    heads: int = 8
    groups: int = 16

    @nn.compact
    def __call__(self, graph, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x_all = x[:, None, :]
        for i in range(self.num_layers):
            h = DNAConv(self.hidden, heads=self.heads, groups=self.groups,
                        dropout=0.0, name=f"dna{i}")(graph, x_all,
                                                     train=train)
            h = nn.relu(h)
            x_all = jnp.concatenate([x_all, h[:, None, :]], axis=1)
        x = x_all[:, -1]
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


MODELS = {
    "sgc": (SGCNet, dict(lr=0.1, wd=5e-6)),
    "agnn": (AGNNNet, dict(lr=0.01, wd=5e-4)),
    "arma": (ARMANet, dict(lr=0.01, wd=5e-4)),
    "spline": (SplineNet, dict(lr=0.01, wd=5e-4)),
    "dna": (DNANet, dict(lr=5e-3, wd=5e-4)),
}


def run(model_name: str, dataset_name: str = "Cora", epochs: int = 200,
        seed: int = 0):
    cls, hp = MODELS[model_name]
    transform = NormalizeFeatures()
    ds = Planetoid("datasets_cache", dataset_name, transform=transform)
    data = ds[0]
    if model_name == "spline":
        data = TargetIndegree()(data)
    graph = from_data(data)
    model = cls(num_classes=ds.num_classes)
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, graph, graph.x)
    tx = optax.adamw(hp["lr"], weight_decay=hp["wd"])
    opt = tx.init(params)

    def epoch_step(carry, _):
        params, opt, key = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            logits = model.apply(p, graph, graph.x, train=True,
                                 rngs={"dropout": sub})
            return masked_softmax_xent(logits, graph.y, graph.train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, key), loss

    @jax.jit
    def train_all(params, opt, key):
        (params, opt, _), losses = jax.lax.scan(
            epoch_step, (params, opt, key), None, length=epochs)
        return params, losses

    params, losses = train_all(params, opt, key)
    logits = jax.jit(lambda p: model.apply(p, graph, graph.x))(params)
    accs = {s: float(masked_accuracy(logits, graph.y,
                                     graph.extras[f"{s}_mask"]))
            for s in ("train", "val", "test")}
    print(f"[{model_name}/{dataset_name}] loss {float(losses[-1]):.4f} "
          f"train {accs['train']:.4f} val {accs['val']:.4f} "
          f"test {accs['test']:.4f}")
    return accs


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=sorted(MODELS))
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--epochs", type=int, default=200)
    args = p.parse_args()
    run(args.model, args.dataset, args.epochs)
