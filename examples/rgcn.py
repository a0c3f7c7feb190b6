"""RGCN on Entities/MUTAG-RDF — mirror of the reference's
examples/rgcn.py (2 RGCNConv layers, num_bases=30, node-id features,
train/test over labelled entity indices)."""

import argparse

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets import Entities
from pytorch_geometric_tpu.nn.conv import RGCNConv


class Net(nn.Module):
    num_nodes: int
    num_relations: int
    num_classes: int

    @nn.compact
    def __call__(self, graph, edge_type, norm=None, closure=None,
                 norms=None, fused_ops=None):
        if fused_ops is not None:
            # fused table-SpMM backends (sorted-scatter backward):
            # nn/conv/rgcn_conv.rgcn_fused_op, one per layer
            x = RGCNConv(self.num_nodes, 16, self.num_relations,
                         num_bases=30, name="conv1")(
                graph, None, edge_type, norm=norm,
                fused_op=fused_ops[0])
            x = nn.relu(x)
            return RGCNConv(16, self.num_classes, self.num_relations,
                            num_bases=30, name="conv2")(
                graph, x, edge_type, norm=norm, fused_op=fused_ops[1])
        if closure is not None:
            # layered training-closure mode (data/closure.py): each
            # conv maps its layer's input node set to its output set
            x = RGCNConv(self.num_nodes, 16, self.num_relations,
                         num_bases=30, name="conv1")(
                None, None, None, norm=norms[0], closure=closure[0])
            x = nn.relu(x)
            return RGCNConv(16, self.num_classes, self.num_relations,
                            num_bases=30, name="conv2")(
                None, x, None, norm=norms[1], closure=closure[1])
        x = RGCNConv(self.num_nodes, 16, self.num_relations,
                     num_bases=30, name="conv1")(graph, None, edge_type,
                                                 norm=norm)
        x = nn.relu(x)
        x = RGCNConv(16, self.num_classes, self.num_relations,
                     num_bases=30, name="conv2")(graph, x, edge_type,
                                                 norm=norm)
        return x


def run(epochs: int = 50, seed: int = 0):
    ds = Entities("datasets_cache", "MUTAG")
    data = ds[0]
    graph = from_data(data)
    et = graph.extras["edge_type"]
    train_idx = jnp.asarray(data.train_idx)
    test_idx = jnp.asarray(data.test_idx)
    y = graph.y

    from pytorch_geometric_tpu.nn.conv.rgcn_conv import rgcn_norm
    norm = rgcn_norm(graph, et, 46)   # static: hoisted out of the loop

    model = Net(num_nodes=graph.num_nodes, num_relations=46,
                num_classes=2)
    params = model.init(jax.random.PRNGKey(seed), graph, et, norm)
    tx = optax.adam(0.01)
    opt = tx.init(params)

    def epoch_step(carry, _):
        params, opt = carry

        def loss_fn(p):
            logits = model.apply(p, graph, et, norm)
            logp = jax.nn.log_softmax(logits)
            sel = jnp.take(logp, train_idx, axis=0)
            lab = jnp.take(y, train_idx).astype(jnp.int32)
            return -jnp.mean(
                jnp.take_along_axis(sel, lab[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt), loss

    @jax.jit
    def train_all(params, opt):
        (params, opt), losses = jax.lax.scan(epoch_step, (params, opt),
                                             None, length=epochs)
        return params, losses

    params, losses = train_all(params, opt)
    logits = jax.jit(lambda p: model.apply(p, graph, et, norm))(params)
    pred = jnp.argmax(jnp.take(logits, test_idx, axis=0), axis=1)
    acc = float(jnp.mean(
        (pred == jnp.take(y, test_idx).astype(jnp.int32))))
    print(f"Loss: {float(losses[-1]):.4f}, Test Acc: {acc:.4f}")
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args()
    run(args.epochs)
