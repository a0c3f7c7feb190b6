"""SplineConv + voxel-grid pooling on MNIST superpixels — mirror of the
reference's examples/mnist_voxel_grid.py.  Voxel clusters depend only on
pos, so they are precomputed at transform time (cluster fields), applied
on device via pool_graph_masked."""

import argparse

import numpy as np

from pytorch_geometric_tpu.cluster import voxel_grid
from pytorch_geometric_tpu.transforms import Cartesian, Compose


class PrecomputeVoxelLevels:
    """cluster{k} fields from voxel grids of growing cell size.  Cluster
    ids are rep node ids (first member), keeping the batching-offset
    convention."""

    def __init__(self, sizes=(5.0, 10.0)):
        self.sizes = sizes

    def __call__(self, data):
        rep = np.arange(data.num_nodes, dtype=np.int64)
        for k, size in enumerate(self.sizes, start=1):
            cell = voxel_grid(data.pos, size=size)
            cell = cell[rep]  # cell of each node's current representative
            # representative = first node (lowest id) in each cell
            order = np.lexsort((np.arange(len(cell)), cell))
            first_of = {}
            for i in order:
                first_of.setdefault(int(cell[i]), int(i))
            rep = np.asarray([first_of[int(c)] for c in cell],
                             dtype=np.int64)
            setattr(data, f"cluster{k}", rep.copy())
        return data


def run(epochs: int = 3, batch_size: int = 64, seed: int = 0,
        train_samples: int = 1500):
    # identical training harness to mnist_graclus, different coarsening
    from examples import mnist_graclus as mg
    from pytorch_geometric_tpu.data import DataLoader
    from pytorch_geometric_tpu.datasets import MNISTSuperpixels

    transform = Compose([Cartesian(), PrecomputeVoxelLevels()])
    train_ds = MNISTSuperpixels("datasets_cache_voxel", train=True,
                                pre_transform=transform,
                                num_synthetic=train_samples)
    test_ds = MNISTSuperpixels("datasets_cache_voxel", train=False,
                               pre_transform=transform,
                               num_synthetic=train_samples)
    import jax
    import optax

    model = mg.Net()
    train_loader = DataLoader(train_ds, batch_size=batch_size,
                              shuffle=True, seed=seed)
    test_loader = DataLoader(test_ds, batch_size=batch_size)
    g0 = next(iter(train_loader))
    key = jax.random.PRNGKey(seed)
    params = model.init({"params": key, "dropout": key}, g0)
    tx = optax.adam(0.01)
    opt = tx.init(params)

    import jax.numpy as jnp

    @jax.jit
    def train_step(params, opt, graph, key):
        def loss_fn(p):
            logits = model.apply(p, graph, train=True,
                                 rngs={"dropout": key})
            logp = jax.nn.log_softmax(logits)
            y = graph.y.astype(jnp.int32)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = graph.graph_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def eval_step(params, graph):
        logits = model.apply(params, graph)
        pred = jnp.argmax(logits, axis=1)
        m = graph.graph_mask
        return jnp.sum((pred == graph.y.astype(jnp.int32)) & m), \
            jnp.sum(m)

    for epoch in range(1, epochs + 1):
        losses = []
        for graph in train_loader:
            key, sub = jax.random.split(key)
            params, opt, loss = train_step(params, opt, graph, sub)
            losses.append(float(loss))
        cor = tot = 0
        for graph in test_loader:
            c, t = eval_step(params, graph)
            cor, tot = cor + int(c), tot + int(t)
        print(f"Epoch {epoch:02d}, Loss: {np.mean(losses):.4f}, "
              f"Test Acc: {cor / max(tot, 1):.4f}")
    return cor / max(tot, 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()
    run(args.epochs)
