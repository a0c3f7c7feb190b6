"""Edge-partitioned distributed GCN — the multi-chip scaling showcase
(north-star config "edge-partitioned across N hosts, halo all-to-all";
the reference has no counterpart, SURVEY §2d).

Round 4: built entirely from the PUBLIC distributed nn API — a
:class:`GraphPartition` (fast-kernel halo SpMM: BSR dense blocks +
packed Pallas sparse + bipartite halo exchange, parallel/fast.py) and
the stock ``DistGCN`` model whose layers are the same ``GCNConv``
modules the single-device path uses, passed a ``shard_ctx``.  No
hand-rolled aggregation closures.  Run on a virtual mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
      examples/distributed_gcn.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.data import from_data
from pytorch_geometric_tpu.datasets.synthetic import synthetic_citation_graph
from pytorch_geometric_tpu.parallel.api import GraphPartition
from pytorch_geometric_tpu.parallel.models import DistGCN
from pytorch_geometric_tpu.transforms import NormalizeFeatures


def run(epochs: int = 30, hidden: int = 16, seed: int = 0):
    n_dev = len(jax.devices())
    if jax.default_backend() == "cpu" and n_dev < 2:
        raise SystemExit("need a multi-device mesh (set XLA_FLAGS="
                         "--xla_force_host_platform_device_count=8)")
    data = NormalizeFeatures()(synthetic_citation_graph("cora",
                                                        seed=seed))
    graph = from_data(data)
    N = graph.num_nodes
    emask = np.asarray(graph.real_edge_mask())
    s = np.asarray(graph.senders)[emask]
    r = np.asarray(graph.receivers)[emask]
    keep = s != r                  # GraphPartition appends self loops
    part = GraphPartition(s[keep], r[keep], N, n_dev, window=256,
                          dense_threshold=128)

    C = int(np.asarray(graph.y).max()) + 1
    model = DistGCN(hidden_channels=hidden, num_classes=C)
    x_sh = part.shard_nodes(np.asarray(graph.x))
    y_sh = part.shard_nodes(np.asarray(graph.y))
    m_sh = part.shard_nodes(
        np.asarray(graph.train_mask).astype(np.float32))
    params = part.init_model(model, x_sh, jax.random.PRNGKey(seed),
                             has_rng=True)
    tx = optax.adam(0.01)
    opt = tx.init(params)

    def loss_fn(logits, y_l, m_l):
        logp = jax.nn.log_softmax(logits)
        oh = (y_l[:, None] == jnp.arange(C)[None, :])
        nll = -jnp.sum(logp * oh.astype(logp.dtype), axis=1)
        return jnp.sum(nll * m_l), jnp.sum(m_l)

    step = part.make_train_step(model, tx, loss_fn, has_rng=True)
    key = jax.random.PRNGKey(seed + 1)
    for epoch in range(1, epochs + 1):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x_sh, y_sh, m_sh, sub)
        if epoch % 10 == 0 or epoch == 1:
            print(f"Epoch {epoch:03d}  loss {float(loss):.4f}")

    logits = part.unshard_nodes(part.apply_model(model, params, x_sh))
    pred = np.argmax(logits, axis=1)
    y = np.asarray(graph.y)

    def acc(mask):
        m = np.asarray(mask).astype(bool)
        return float((pred[m] == y[m]).mean()) if m.any() else 0.0

    print(f"devices={n_dev}  train {acc(graph.train_mask):.4f}  "
          f"val {acc(graph.val_mask):.4f}  "
          f"test {acc(graph.test_mask):.4f}")
    return acc(graph.test_mask)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    run(epochs=a.epochs, hidden=a.hidden, seed=a.seed)
