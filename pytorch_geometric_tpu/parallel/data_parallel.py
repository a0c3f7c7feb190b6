"""Data parallelism over graph shards.

Reference counterpart: ``torch_geometric.nn.DataParallel`` — scatter a
*list of graphs* across GPUs, replicate the module, gather outputs on
device 0 (reference: examples/data_parallel.py:8,37;
ConvexPruning.py:530-531,559-560; NCCL backend via
docker/Dockerfile:16,26-31).

TPU-native redesign: no module replication, no gather-to-rank-0.  Each
device holds one *padded graph shard* (identical static shapes — the
bucketed loader guarantees this); the train step runs under ``shard_map``
over a ``Mesh`` axis with parameters replicated and gradients ``psum``'d
over ICI.  One compiled program, N chips.
"""

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_geometric_tpu.data.batch import collate
from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.graph import Graph


def stack_graphs(graphs: Sequence[Graph]) -> Graph:
    """Stack identically-shaped padded Graphs along a new leading device
    axis (the shard axis fed to shard_map)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)


def shard_data_list(data_list: List[Data], num_shards: int,
                    num_nodes: int, num_edges: int,
                    graphs_per_shard: int) -> Graph:
    """Split a list of host graphs round-robin into ``num_shards`` padded
    collated shards and stack them (the TPU analog of DataParallel's
    scatter, examples/data_parallel.py:37)."""
    shards = [data_list[i::num_shards] for i in range(num_shards)]
    collated = [
        collate(s, num_nodes=num_nodes, num_edges=num_edges,
                num_graphs=graphs_per_shard + 1)
        for s in shards
    ]
    return stack_graphs(collated)


class DataParallelTrainer:
    """Builds a pjit'd data-parallel train step.

    ``loss_fn(params, graph, rng) -> scalar`` is user code on ONE shard;
    the trainer wraps it in shard_map: per-device loss on the local
    shard, gradients psum-averaged over the ``axis`` mesh axis,
    optimizer update computed redundantly (replicated params).
    """

    def __init__(self, mesh: Mesh, loss_fn: Callable, optimizer,
                 axis: str = "dp"):
        self.mesh = mesh
        self.axis = axis
        self.loss_fn = loss_fn
        self.tx = optimizer
        self._step = self._build()

    def _build(self):
        mesh, axis, loss_fn, tx = self.mesh, self.axis, self.loss_fn, self.tx
        n = mesh.shape[axis]

        def local_step(params, opt_state, graph, rng):
            # graph leaves arrive with a leading shard dim of size 1
            graph = jax.tree_util.tree_map(lambda a: a[0], graph)
            loss, grads = jax.value_and_grad(loss_fn)(params, graph, rng)
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        shard_spec = P(axis)
        rep = P()
        step = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(rep, rep, shard_spec, rep),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )
        return jax.jit(step)

    def init(self, params):
        return self.tx.init(params)

    def grads(self, params, stacked_graph: Graph, rng):
        """pmean'd gradients (no optimizer update) — the DP gradient
        as the update step sees it, for parity checks and custom
        update rules."""
        mesh, axis, loss_fn = self.mesh, self.axis, self.loss_fn

        def local_grads(params, graph, rng):
            graph = jax.tree_util.tree_map(lambda a: a[0], graph)
            grads = jax.grad(loss_fn)(params, graph, rng)
            return jax.lax.pmean(grads, axis)

        fn = jax.jit(jax.shard_map(
            local_grads, mesh=mesh, in_specs=(P(), P(axis), P()),
            out_specs=P(), check_vma=False))
        return fn(params, stacked_graph, rng)

    def step(self, params, opt_state, stacked_graph: Graph, rng):
        """One synchronous DP step.  ``stacked_graph`` leading dim must
        equal the mesh axis size."""
        return self._step(params, opt_state, stacked_graph, rng)
