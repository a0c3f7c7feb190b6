"""Edge-partitioned multi-chip SpMM on the virtual 8-device mesh:
halo all_to_all and all_gather strategies vs the single-device kernel,
forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pytorch_geometric_tpu.ops.spmm import spmm
from pytorch_geometric_tpu.parallel import make_mesh
from pytorch_geometric_tpu.parallel.partition import (
    allgather_spmm,
    halo_spmm,
    partition_graph,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    N, E, F = 97, 600, 12
    senders = rng.integers(0, N, E)
    receivers = rng.integers(0, N, E)
    w = rng.normal(size=E).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    n_dev = len(jax.devices())
    shards, w_stacked = partition_graph(senders, receivers, N, n_dev,
                                        edge_weights=w)
    want = np.asarray(spmm(jnp.asarray(senders), jnp.asarray(receivers),
                           jnp.asarray(x), N, weights=jnp.asarray(w)))
    return shards, w_stacked, x, want, N


def _run_sharded(shards, w_stacked, x, kernel):
    mesh = make_mesh(axis_names=("graph",))
    n_dev = shards.num_devices
    tables = shards.device_arrays()
    x_sharded = jnp.asarray(shards.shard_nodes(x))
    w_dev = jnp.asarray(w_stacked)

    def fn(x_s, w_s, *table_vals):
        t = {k: v[0] for k, v in zip(sorted(tables), table_vals)}
        if kernel == "halo":
            out = halo_spmm(x_s[0], w_s[0], t, "graph",
                            shards.halo_size, n_dev)
        else:
            out = allgather_spmm(x_s[0], w_s[0], t, "graph")
        return out[None]

    spec = P("graph")
    sharded = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec) + (spec,) * len(tables),
        out_specs=spec, check_vma=False))
    table_vals = [tables[k] for k in sorted(tables)]
    out = sharded(x_sharded, w_dev, *table_vals)
    return shards.unshard_nodes(out, x.shape[0])


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual mesh")
@pytest.mark.parametrize("kernel", ["halo", "allgather"])
def test_sharded_spmm_matches_reference(setup, kernel):
    shards, w_stacked, x, want, N = setup
    got = _run_sharded(shards, w_stacked, x, kernel)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual mesh")
def test_halo_spmm_grad_flows(setup):
    shards, w_stacked, x, want, N = setup
    mesh = make_mesh(axis_names=("graph",))
    n_dev = shards.num_devices
    tables = shards.device_arrays()
    table_vals = [tables[k] for k in sorted(tables)]
    spec = P("graph")

    def fn(x_s, w_s, *tvals):
        t = {k: v[0] for k, v in zip(sorted(tables), tvals)}
        out = halo_spmm(x_s[0], w_s[0], t, "graph", shards.halo_size,
                        n_dev)
        return jax.lax.psum(jnp.sum(out ** 2), "graph")

    sharded = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec) + (spec,) * len(tables),
        out_specs=P(), check_vma=False)

    def loss(x_full):
        x_sh = x_full  # already sharded layout (P, S, F)
        return sharded(x_sh, jnp.asarray(w_stacked), *table_vals)

    x_sharded = jnp.asarray(shards.shard_nodes(x))
    g = jax.jit(jax.grad(loss))(x_sharded)
    g_flat = shards.unshard_nodes(g, x.shape[0])

    # reference grad through single-device spmm
    rng = np.random.default_rng(0)
    senders = jnp.asarray(np.asarray(
        np.repeat(0, 0)))  # rebuild from setup instead:
    # recompute reference via dense adjacency
    A = np.zeros((N, N))
    for p in range(shards.num_devices):
        for e in range(shards.edges_per_shard):
            if shards.edge_mask[p, e]:
                r = p * shards.nodes_per_shard + shards.edge_dst_local[p, e]
                s = (shards.edge_src_owner[p, e] * shards.nodes_per_shard
                     + shards.edge_src_row[p, e])
                A[r, s] += w_stacked[p, e]
    want_out = A @ x
    want_grad = 2 * A.T @ want_out
    np.testing.assert_allclose(g_flat, want_grad, rtol=1e-3, atol=1e-3)
