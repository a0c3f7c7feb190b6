"""GAT on Cora — mirror of the reference's examples/gat.py (8 heads x 8
channels + 1-head output layer, dropout 0.6 on inputs and attention,
Adam lr 0.005 wd 5e-4)."""

import argparse

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
from pytorch_geometric_tpu.nn.conv import GATConv
from pytorch_geometric_tpu.transforms import NormalizeFeatures


class GAT(nn.Module):
    num_classes: int
    hidden: int = 8
    heads: int = 8
    dropout: float = 0.6
    # fused-backend-only: make conv2 return its raw num‖den accumulator
    # (see GATConv.raw_out) so a train-mask loss can gather rows before
    # the lane-padded (N, num_classes) division/softmax glue
    raw_final: bool = False

    @nn.compact
    def __call__(self, graph, x, *, train: bool = False, adj=None,
                 flash_op=None, closure=None):
        cl1, cl2 = closure if closure is not None else (None, None)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = GATConv(self.hidden, heads=self.heads, dropout=self.dropout,
                    name="conv1")(graph, x, train=train, adj=adj,
                                  flash_op=flash_op, closure=cl1)
        x = nn.elu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = GATConv(self.num_classes, heads=1, concat=False,
                    dropout=self.dropout, raw_out=self.raw_final,
                    name="conv2")(graph, x, train=train, adj=adj,
                                  flash_op=flash_op, closure=cl2)
        return x


def make_flash_op(graph, backend: str = "auto"):
    """Pick a fused attention backend for this graph:

    - ``packed``: per-edge one-hot MXU kernels (ops/packed_gat.py) —
      any N, O(E) work; the default (PubMed layer fwd+bwd 4.7 ms vs
      25.7 for block-sparse masks at 0.05% intra-block density).
    - ``bsr``: block-sparse masked kernels (ops/bsr_gat.py) — wins
      when the RCM-ordered adjacency has dense blocks.
    - ``dense``: the (N, N)-mask flash operator, small graphs only.
    - ``none``: the XLA segment-softmax path.
    """
    import numpy as np

    from pytorch_geometric_tpu.nn.conv import gat_dense_adj

    if backend == "none":
        return None
    if backend in ("auto", "packed"):
        from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat
        return PackedFlashGat(np.asarray(gat_dense_adj(graph)),
                              window=896, tile=224)
    if backend == "bsr":
        from pytorch_geometric_tpu.ops.bsr_gat import BsrFlashGat
        return BsrFlashGat(np.asarray(gat_dense_adj(graph)))
    if backend == "dense":
        from pytorch_geometric_tpu.ops.flash_gat import FlashGatOperator
        assert graph.num_nodes <= 8192, "dense flash is N-capped"
        return FlashGatOperator(gat_dense_adj(graph))
    raise ValueError(backend)


def run(dataset_name: str = "Cora", epochs: int = 200, seed: int = 0,
        backend: str = "auto"):
    from pytorch_geometric_tpu.utils.reorder import reorder_graph

    ds = Planetoid("datasets_cache", dataset_name,
                   transform=NormalizeFeatures())
    data = ds[0]
    if backend != "none":
        data = reorder_graph(data)   # RCM: dense packed-kernel buckets
    graph = from_data(data)
    flash_op = make_flash_op(graph, backend)
    model = GAT(num_classes=ds.num_classes)
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, graph, graph.x,
                        flash_op=flash_op)
    tx = optax.adamw(5e-3, weight_decay=5e-4)
    opt = tx.init(params)

    def epoch_step(carry, _):
        params, opt, key = carry
        key, sub = jax.random.split(key)

        def loss_fn(p):
            logits = model.apply(p, graph, graph.x, train=True,
                                 flash_op=flash_op,
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
    logits = jax.jit(lambda p: model.apply(p, graph, graph.x,
                                           flash_op=flash_op))(params)
    accs = {s: float(masked_accuracy(logits, graph.y,
                                     graph.extras[f"{s}_mask"]))
            for s in ("train", "val", "test")}
    print(f"Loss: {float(losses[-1]):.4f}  "
          f"Train: {accs['train']:.4f}, Val: {accs['val']:.4f}, "
          f"Test: {accs['test']:.4f}")
    return accs


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "packed", "bsr", "dense", "none"])
    args = p.parse_args()
    run(args.dataset, args.epochs, backend=args.backend)
