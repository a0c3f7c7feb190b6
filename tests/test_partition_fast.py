"""Fast-kernel halo SpMM (parallel/fast.py) vs the generic halo path
and a single-device reference — forward + gradient parity on the
virtual 8-device mesh (VERDICT round 3, item 1: route the distributed
aggregation through the packed/BSR kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pytorch_geometric_tpu.ops.spmm import spmm
from pytorch_geometric_tpu.parallel import make_mesh
from pytorch_geometric_tpu.parallel.fast import PartitionedSpmm
from pytorch_geometric_tpu.parallel.partition import partition_graph


def _problem(seed=0, N=500, E=4000, F=12, communities=8):
    """Clustered graph so the dense/sparse split has dense blocks."""
    rng = np.random.default_rng(seed)
    comm = np.sort(rng.integers(0, communities, N))
    src = rng.integers(0, N, E)
    intra = rng.random(E) < 0.7
    lo = np.searchsorted(comm, comm[src])
    hi = np.searchsorted(comm, comm[src], side="right")
    dst = np.where(intra,
                   lo + (rng.random(E) * (hi - lo)).astype(np.int64),
                   rng.integers(0, N, E))
    w = rng.normal(size=E).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    return src, dst, w, x, N


def _run_fast(op, consts, x_sh, num_devices):
    mesh = make_mesh((num_devices,), ("graph",),
                     devices=jax.devices()[:num_devices])
    leaves, treedef = jax.tree_util.tree_flatten(consts)

    def fn(x_l, *cvals):
        c = jax.tree_util.tree_unflatten(
            treedef, [v[0] for v in cvals])
        return op.apply(c, x_l[0], "graph")[None]

    spec = P("graph")
    sharded = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,) * (1 + len(leaves)),
        out_specs=spec, check_vma=False))
    return sharded(x_sh, *leaves)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual mesh")
@pytest.mark.parametrize("num_devices", [1, 4])
@pytest.mark.parametrize("dense_threshold", [32, 10**9])
def test_partitioned_spmm_matches_reference(num_devices,
                                            dense_threshold):
    """Forward parity: fast halo SpMM == single-device weighted SpMM,
    with the BSR dense split on (threshold=32) and off (huge)."""
    src, dst, w, x, N = _problem()
    shards, (wl, wr) = partition_graph(src, dst, N, num_devices,
                                       edge_weights=w)
    op = PartitionedSpmm(shards, wl, wr, window=64, sparse_tile=128,
                         dense_threshold=dense_threshold)
    _, consts = op.bind()
    if dense_threshold == 32 and num_devices == 4:
        assert op.num_dense_blocks > 0, "fixture should have dense blocks"
    x_sh = jnp.asarray(shards.shard_nodes(x))
    out_sh = _run_fast(op, consts, x_sh, num_devices)
    got = shards.unshard_nodes(np.asarray(out_sh), N)

    ref = np.asarray(spmm(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(x), N, weights=jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=6e-2)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual mesh")
def test_partitioned_spmm_grad_matches_reference():
    """Gradient parity (d loss / d x) through the fast halo path —
    custom-VJP packed kernels + the all_to_all transpose."""
    src, dst, w, x, N = _problem(seed=3)
    P_dev = 4
    shards, (wl, wr) = partition_graph(src, dst, N, P_dev,
                                       edge_weights=w)
    op = PartitionedSpmm(shards, wl, wr, window=64, sparse_tile=128,
                         dense_threshold=32)
    _, consts = op.bind()
    x_sh = jnp.asarray(shards.shard_nodes(x))
    mesh = make_mesh((P_dev,), ("graph",),
                     devices=jax.devices()[:P_dev])
    leaves, treedef = jax.tree_util.tree_flatten(consts)
    probe = jnp.asarray(shards.shard_nodes(
        np.sin(np.arange(N * x.shape[1], dtype=np.float32))
        .reshape(N, x.shape[1])))

    def fn(x_l, pr, *cvals):
        c = jax.tree_util.tree_unflatten(
            treedef, [v[0] for v in cvals])
        out = op.apply(c, x_l[0], "graph")
        return jax.lax.psum(jnp.sum(out * pr[0]), "graph")

    spec = P("graph")
    loss = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,) * (2 + len(leaves)),
        out_specs=P(), check_vma=False))
    gx_sh = jax.jit(jax.grad(
        lambda xs: loss(xs, probe, *leaves)))(x_sh)
    got = shards.unshard_nodes(np.asarray(gx_sh), N)

    pr_full = np.sin(np.arange(N * x.shape[1], dtype=np.float32)) \
        .reshape(N, x.shape[1])

    def ref_loss(xv):
        out = spmm(jnp.asarray(src), jnp.asarray(dst), xv, N,
                   weights=jnp.asarray(w))
        return jnp.sum(out * jnp.asarray(pr_full))

    ref = np.asarray(jax.grad(ref_loss)(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=6e-2)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual mesh")
def test_halo_exchange_moves_bf16():
    """The halo all_to_all must carry rows at the kernels' bf16
    compute precision (round 5: half the ICI bytes of f32 at
    identical kernel-input values) — locked in via the jaxpr so a
    refactor reintroducing an f32 exchange fails loudly."""
    src, dst, w, x, N = _problem()
    num_devices = 4
    shards, (wl, wr) = partition_graph(src, dst, N, num_devices,
                                       edge_weights=w)
    op = PartitionedSpmm(shards, wl, wr, window=128,
                         dense_threshold=32)
    _, consts = op.bind()
    consts = jax.tree_util.tree_map(jnp.asarray, consts)
    mesh = make_mesh((num_devices,), ("graph",),
                     devices=jax.devices()[:num_devices])
    leaves, treedef = jax.tree_util.tree_flatten(consts)

    def fn(x_l, *cvals):
        c = jax.tree_util.tree_unflatten(
            treedef, [v[0] for v in cvals])
        return op.apply(c, x_l[0], "graph")[None]

    spec = P("graph")
    x_sh = jnp.asarray(
        x[: shards.nodes_per_shard * num_devices].reshape(
            num_devices, shards.nodes_per_shard, -1))
    fn_sh = jax.shard_map(fn, mesh=mesh,
                          in_specs=(spec,) * (1 + len(leaves)),
                          out_specs=spec, check_vma=False)
    jaxpr = jax.make_jaxpr(fn_sh)(x_sh, *leaves)

    # the collective lives inside the shard_map sub-jaxpr — walk every
    # nested jaxpr (params may hold Jaxpr or ClosedJaxpr values)
    def find_a2a(jx):
        found = []
        for e in jx.eqns:
            if "all_to_all" in e.primitive.name:
                found.append(e)
            for v in e.params.values():
                for vv in (v if isinstance(v, (list, tuple)) else [v]):
                    inner = getattr(vv, "jaxpr", vv)
                    if hasattr(inner, "eqns"):
                        found.extend(find_a2a(inner))
        return found

    collectives = find_a2a(jaxpr.jaxpr)
    assert collectives, "no all_to_all found in the halo program"
    for e in collectives:
        assert e.invars[0].aval.dtype == jnp.bfloat16, \
            f"halo all_to_all carries {e.invars[0].aval.dtype}, " \
            "expected bfloat16"
