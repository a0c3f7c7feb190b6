"""Edge-partitioned distributed GCN — the multi-chip scaling showcase
(north-star config "edge-partitioned across N hosts, halo all-to-all";
the reference has no counterpart, SURVEY §2d).

The graph's nodes are blocked across the mesh; each device owns its
block's incoming edges; every GCN layer exchanges boundary features via
halo all_to_all before the local aggregation.  Run on a virtual mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
      examples/distributed_gcn.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets.synthetic import synthetic_citation_graph
from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm
from pytorch_geometric_tpu.parallel import make_mesh
from pytorch_geometric_tpu.parallel.partition import (
    halo_spmm,
    partition_graph,
)
from pytorch_geometric_tpu.transforms import NormalizeFeatures


def run(epochs: int = 30, hidden: int = 16, seed: int = 0):
    if jax.default_backend() == "cpu" and len(jax.devices()) < 2:
        raise SystemExit("need a multi-device mesh (set XLA_FLAGS="
                         "--xla_force_host_platform_device_count=8)")
    data = NormalizeFeatures()(synthetic_citation_graph("cora",
                                                        seed=seed))
    graph = from_data(data)
    N = graph.num_nodes
    norm = gcn_norm(graph)

    n_dev = len(jax.devices())
    shards, (wl_np, wr_np) = partition_graph(
        np.asarray(norm.senders), np.asarray(norm.receivers), N, n_dev,
        edge_weights=np.asarray(norm.weights))
    mesh = make_mesh(axis_names=("graph",))
    tables = shards.device_arrays()
    tkeys = sorted(tables)
    S = shards.nodes_per_shard

    x_sh = jnp.asarray(shards.shard_nodes(np.asarray(graph.x)))
    y_sh = jnp.asarray(shards.shard_nodes(np.asarray(graph.y)))
    tm_sh = jnp.asarray(shards.shard_nodes(
        np.asarray(graph.train_mask)))
    te_sh = jnp.asarray(shards.shard_nodes(np.asarray(graph.test_mask)))
    wl_dev = jnp.asarray(wl_np)
    wr_dev = jnp.asarray(wr_np)

    F = graph.x.shape[1]
    C = int(np.asarray(graph.y).max()) + 1
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = {
        "w1": jax.random.normal(k1, (F, hidden)) * (2.0 / F) ** 0.5,
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k2, (hidden, C)) * (2.0 / hidden) ** 0.5,
        "b2": jnp.zeros((C,)),
    }
    tx = optax.adam(0.01)
    opt = tx.init(params)

    def local_forward(p, x_l, w_l, t):
        h = x_l @ p["w1"] + p["b1"]
        h = halo_spmm(h, w_l, t, "graph", shards.halo_size, n_dev)
        h = jax.nn.relu(h)
        h = h @ p["w2"] + p["b2"]
        return halo_spmm(h, w_l, t, "graph", shards.halo_size,
                         n_dev)

    def local_step(p, opt, x_l, y_l, m_l, wl_l, wr_l, *tvals):
        t = {k: v[0] for k, v in zip(tkeys, tvals)}

        def loss_fn(p):
            logits = local_forward(p, x_l[0], (wl_l[0], wr_l[0]), t)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(
                logp, y_l[0][:, None].astype(jnp.int32), axis=1)[:, 0]
            m = m_l[0].astype(jnp.float32)
            return jax.lax.psum(jnp.sum(nll * m), "graph") / \
                jax.lax.psum(jnp.sum(m) + 1e-9, "graph")

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = jax.lax.pmean(grads, "graph")
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    spec = P("graph")
    rep = P()
    step = jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, rep, spec, spec, spec, spec, spec)
        + (spec,) * len(tkeys),
        out_specs=(rep, rep, rep), check_vma=False))

    def accuracy(p, mask_sh):
        def local_acc(x_l, y_l, m_l, wl_l, wr_l, *tvals):
            t = {k: v[0] for k, v in zip(tkeys, tvals)}
            logits = local_forward(p, x_l[0], (wl_l[0], wr_l[0]), t)
            pred = jnp.argmax(logits, axis=1)
            m = m_l[0]
            cor = jnp.sum((pred == y_l[0].astype(jnp.int32)) & m)
            return (jax.lax.psum(cor, "graph"),
                    jax.lax.psum(jnp.sum(m), "graph"))
        fn = jax.jit(jax.shard_map(
            local_acc, mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec)
            + (spec,) * len(tkeys),
            out_specs=(rep, rep), check_vma=False))
        c, t = fn(x_sh, y_sh, mask_sh, wl_dev, wr_dev,
                  *[tables[k] for k in tkeys])
        return float(c) / max(float(t), 1.0)

    tvals = [tables[k] for k in tkeys]
    for epoch in range(1, epochs + 1):
        params, opt, loss = step(params, opt, x_sh, y_sh, tm_sh,
                                 wl_dev, wr_dev, *tvals)
        if epoch % 10 == 0:
            print(f"Epoch {epoch:03d}, Loss {float(loss):.4f}, "
                  f"Test {accuracy(params, te_sh):.4f}")
    acc = accuracy(params, te_sh)
    print(f"[{n_dev} devices, halo all_to_all] final test acc "
          f"{acc:.4f}")
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    args = p.parse_args()
    run(args.epochs)
