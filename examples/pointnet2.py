"""PointNet++ classification on ModelNet10 — mirror of the reference's
examples/pointnet++.py (NormalizeScale + SamplePoints transforms, two
fps/radius set-abstraction modules with PointConv, global max pool head).

TPU split: fps/radius neighbourhoods depend only on pos, so they are
precomputed per sample at transform time into fixed-budget padded index
arrays; the convs run on device at static shapes.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pytorch_geometric_tpu.cluster import fps, radius
from pytorch_geometric_tpu.data import Data, DataLoader
from pytorch_geometric_tpu.datasets import ModelNet
from pytorch_geometric_tpu.transforms import (
    Compose,
    NormalizeScale,
    SamplePoints,
)

N_POINTS = 128
SA1_K, SA1_R, SA1_RATIO = 32, 0.4, 0.5
SA2_K, SA2_R, SA2_RATIO = 32, 0.6, 0.25


class PrecomputeSetAbstraction:
    """fps + radius neighbourhoods as padded index fields.

    Stores, per level: sampled node ids (``sa{k}_idx``, cluster-style =
    original node id space so batching offsets them) and neighbourhood
    edges (``sa{k}_src``/``sa{k}_dst``, also node ids) padded to fixed
    budgets with a mask.
    """

    def __call__(self, data):
        pos = data.pos
        idx_space = np.arange(data.num_nodes)
        cur_idx = idx_space
        for lvl, (k, r, ratio) in enumerate(
                [(SA1_K, SA1_R, SA1_RATIO), (SA2_K, SA2_R, SA2_RATIO)],
                start=1):
            p = pos[cur_idx]
            sel = fps(p, ratio=ratio, random_start=False)
            row, col = radius(p, p[sel], r=r, max_num_neighbors=k)
            budget_sel = int(np.ceil(ratio * N_POINTS))
            budget_e = budget_sel * k
            # pad: selected ids (global node ids)
            sel_g = cur_idx[sel]
            sel_pad = np.zeros(budget_sel, dtype=np.int64)
            sel_pad[: len(sel_g)] = sel_g
            sel_mask = np.zeros(budget_sel, dtype=bool)
            sel_mask[: len(sel_g)] = True
            src = np.zeros(budget_e, dtype=np.int64)
            dst = np.zeros(budget_e, dtype=np.int64)
            em = np.zeros(budget_e, dtype=bool)
            m = min(len(row), budget_e)
            src[:m] = cur_idx[col[:m]]        # neighbor: global node id
            dst[:m] = sel_g[row[:m]]          # center:   global node id
            em[:m] = True
            setattr(data, f"cluster_sa{lvl}_idx", sel_pad)
            setattr(data, f"sa{lvl}_sel_mask", sel_mask)
            setattr(data, f"cluster_sa{lvl}_src", src)
            setattr(data, f"cluster_sa{lvl}_dst", dst)
            setattr(data, f"sa{lvl}_edge_mask", em)
            cur_idx = sel_g
        return data


def _mlp(sizes):
    return nn.Sequential([
        layer for size in sizes for layer in (nn.Dense(size), nn.relu)])


class Net(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, graph):
        from pytorch_geometric_tpu.nn.conv import PointConv
        from pytorch_geometric_tpu.nn.pool import global_max_pool

        N = graph.num_nodes
        pos = graph.pos
        # per-graph index fields arrive stacked (G, budget); flatten —
        # entries already carry the batch node offset, pads are masked
        ex = {k: v.reshape(-1) for k, v in graph.extras.items()
              if k.startswith(("cluster_sa", "sa"))}
        # SA1: features None -> 64
        h = PointConv(local_nn=_mlp([64, 64, 128]), name="sa1")(
            None, pos, ex["cluster_sa1_src"], ex["cluster_sa1_dst"], N,
            edge_mask=ex["sa1_edge_mask"])
        # h is indexed by global node id (centers only are valid)
        h = PointConv(local_nn=_mlp([128, 128, 256]), name="sa2")(
            h, pos, ex["cluster_sa2_src"], ex["cluster_sa2_dst"], N,
            edge_mask=ex["sa2_edge_mask"])
        # global readout over level-2 centers
        center_mask = jnp.zeros((N,), bool).at[
            ex["cluster_sa2_idx"]].max(ex["sa2_sel_mask"])
        g = graph.replace(x=h, node_mask=center_mask & graph.node_mask)
        out = global_max_pool(h, g)
        out = nn.relu(nn.Dense(256)(out))
        return nn.Dense(self.num_classes)(out)


def run(epochs: int = 3, batch_size: int = 16, seed: int = 0,
        samples_per_class: int = 12):
    pre = Compose([NormalizeScale(), SamplePoints(N_POINTS),
                   PrecomputeSetAbstraction()])
    train_ds = ModelNet("datasets_cache_pn2", "10", train=True,
                        pre_transform=pre,
                        samples_per_class=samples_per_class)
    test_ds = ModelNet("datasets_cache_pn2", "10", train=False,
                       pre_transform=pre,
                       samples_per_class=samples_per_class)
    train_loader = DataLoader(train_ds, batch_size=batch_size,
                              shuffle=True, seed=seed)
    test_loader = DataLoader(test_ds, batch_size=batch_size)

    model = Net()
    g0 = next(iter(train_loader))
    params = model.init(jax.random.PRNGKey(seed), g0)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, graph):
        def loss_fn(p):
            logits = model.apply(p, graph)
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
            params, opt, loss = train_step(params, opt, graph)
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
