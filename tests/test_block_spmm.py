"""BlockSpmm (BSR dense blocks + packed sparse remainder) and the
explicit-args static SpMM path (bind_external / spmm_static)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.ops.block_spmm import BlockSpmm
from pytorch_geometric_tpu.ops.spmm import SpmmOperator, spmm


def _problem(rng, n=200, f=24):
    # half the edges concentrated in one dense (32, 32) block
    s1 = rng.integers(0, 32, 600)
    r1 = rng.integers(0, 32, 600)
    s2 = rng.integers(0, n, 400)
    r2 = rng.integers(0, n, 400)
    s = np.concatenate([s1, s2])
    r = np.concatenate([r1, r2])
    w = rng.normal(size=s.shape[0]).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return s, r, w, x, n


def test_block_spmm_matches_reference(rng):
    s, r, w, x, n = _problem(rng)
    op = BlockSpmm(s, r, n, w, window=32, dense_threshold=100,
                   sparse_tile=128, compute_dtype=jnp.float32)
    assert op.num_dense_blocks >= 1
    assert 0.3 < op.dense_edge_frac < 0.9
    fn, consts = op.bind()
    xj = jnp.asarray(x)
    out = jax.jit(fn)(consts, xj)
    ref = spmm(jnp.asarray(s), jnp.asarray(r), xj, n,
               weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_block_spmm_grad_matches_reference(rng):
    s, r, w, x, n = _problem(rng)
    op = BlockSpmm(s, r, n, w, window=32, dense_threshold=100,
                   sparse_tile=128, compute_dtype=jnp.float32)
    fn, consts = op.bind()
    xj = jnp.asarray(x)
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    @jax.jit
    def gr(consts, x):
        return jax.grad(lambda xx: jnp.sum(fn(consts, xx) * g))(x)

    d1 = gr(consts, xj)
    d2 = jax.grad(lambda xx: jnp.sum(
        spmm(jnp.asarray(s), jnp.asarray(r), xx, n,
             weights=jnp.asarray(w)) * g))(xj)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-4)


def test_block_spmm_duplicate_edges_sum(rng):
    # multigraph edges inside a dense block must sum, not last-write
    s = np.array([1, 1, 2, 1, 1])
    r = np.array([0, 0, 3, 0, 0])
    w = np.array([1.0, 2.0, 5.0, 3.0, 4.0], np.float32)
    n = 8
    x = rng.normal(size=(n, 4)).astype(np.float32)
    op = BlockSpmm(s, r, n, w, window=8, dense_threshold=3,
                   sparse_tile=128, compute_dtype=jnp.float32)
    fn, consts = op.bind()
    out = jax.jit(fn)(consts, jnp.asarray(x))
    ref = spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(x), n,
               weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_block_spmm_all_sparse_and_all_dense(rng):
    s, r, w, x, n = _problem(rng)
    # threshold so high nothing densifies
    op = BlockSpmm(s, r, n, w, window=32, dense_threshold=10 ** 9,
                   sparse_tile=128, compute_dtype=jnp.float32)
    assert op.num_dense_blocks == 0
    fn, consts = op.bind()
    ref = spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(x), n,
               weights=jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(jax.jit(fn)(consts, jnp.asarray(x))),
        np.asarray(ref), rtol=1e-4, atol=1e-4)
    # threshold 1: everything densifies
    op2 = BlockSpmm(s, r, n, w, window=32, dense_threshold=1,
                    sparse_tile=128, compute_dtype=jnp.float32)
    assert op2.sparse_edges == 0
    fn2, consts2 = op2.bind()
    np.testing.assert_allclose(
        np.asarray(jax.jit(fn2)(consts2, jnp.asarray(x))),
        np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_bind_external_matches_bind(rng):
    s, r, w, x, n = _problem(rng)
    op = SpmmOperator(s, r, n, window=32, tile=128, light=True)
    fn, consts = op.bind_external(jnp.asarray(w))
    ref = spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(x), n,
               weights=jnp.asarray(w))

    @jax.jit
    def run(consts, x):
        return fn(consts, x)

    np.testing.assert_allclose(np.asarray(run(consts, jnp.asarray(x))),
                               np.asarray(ref), rtol=1e-4, atol=1e-4)
    # bwd through the explicit-args custom VJP
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    @jax.jit
    def gr(consts, x):
        return jax.grad(lambda xx: jnp.sum(fn(consts, xx) * g))(x)

    d2 = jax.grad(lambda xx: jnp.sum(
        spmm(jnp.asarray(s), jnp.asarray(r), xx, n,
             weights=jnp.asarray(w)) * g))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gr(consts, jnp.asarray(x))),
                               np.asarray(d2), rtol=1e-4, atol=1e-4)


def test_light_operator_skips_device_tables(rng):
    s, r, w, x, n = _problem(rng)
    op = SpmmOperator(s, r, n, window=32, tile=128, light=True)
    assert "perm" not in op._dev["fwd"]
    assert not hasattr(op, "senders")
    wp = op.pack_weights_host(w)
    assert wp.shape[1] == 128
    # host pack == device pack of the full operator
    op2 = SpmmOperator(s, r, n, window=32, tile=128)
    wp2 = np.asarray(op2.pack_weights(jnp.asarray(w)))
    np.testing.assert_allclose(wp, wp2, rtol=1e-6, atol=1e-6)


def test_auto_sparse_tile_selection(rng):
    """sparse_tile=None picks 128 in the scattered (low-occupancy)
    regime and 256 when buckets are fuller (round 5, VERDICT item 1)."""
    from pytorch_geometric_tpu.ops.block_spmm import BlockStructure

    n = 4096
    # scattered: uniform edges, ~E/(nw^2) << 96 per bucket
    e = 3000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    st = BlockStructure(s, r, n, window=256, dense_threshold=10_000)
    assert st.sparse_tile == 128, st.sparse_tile
    # concentrated: all edges in one window pair -> high occupancy
    s2 = rng.integers(0, 200, 40_000)
    r2 = rng.integers(0, 200, 40_000)
    st2 = BlockStructure(s2, r2, n, window=256,
                         dense_threshold=1_000_000)
    assert st2.sparse_tile == 256, st2.sparse_tile


def test_asymmetric_sparse_window_parity(rng):
    """sparse_window_src widens the remainder's source windows without
    changing results (round-5 scattered-tail lever)."""
    import jax

    n, e = 2048, 40000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    base = BlockSpmm(s, r, n, w, window=256, dense_threshold=5000,
                     sparse_tile=128)
    fn0, c0 = base.bind()
    want = np.asarray(jax.jit(fn0)(c0, x))
    asym = BlockSpmm(s, r, n, w, window=256, dense_threshold=5000,
                     sparse_tile=128, sparse_window_src=512)
    fn1, c1 = asym.bind()
    got = np.asarray(jax.jit(fn1)(c1, x))
    sc = 1 + np.abs(want).max()
    np.testing.assert_allclose(got / sc, want / sc, atol=5e-3)
