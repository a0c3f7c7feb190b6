"""Sorted-CSR Pallas SpMM: parity + grad vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.ops.sorted_spmm import SortedSpmm, pack_sorted
from pytorch_geometric_tpu.ops.spmm import spmm


def random_graph(rng, n, e):
    return rng.integers(0, n, e), rng.integers(0, n, e)


def dense(s, r, w, x, n):
    a = np.zeros((n, n))
    np.add.at(a, (r, s), w)
    return a @ x


def test_pack_sorted_structure(rng):
    n, e = 700, 3000
    s, r = random_graph(rng, n, e)
    pk = pack_sorted(s, r, n, tile=128, rows=128)
    real = pk.perm[pk.perm < e]
    assert sorted(real.tolist()) == list(range(e))
    # every tile maps to one block, first flags cover all blocks
    assert set(pk.tile_block[pk.tile_first == 1].tolist()) == \
        set(range(pk.num_row_blocks))
    # packed local dst consistent with original receivers
    for slot in range(0, pk.num_tiles * pk.tile, 97):
        eid = pk.perm[slot]
        if eid < e:
            t = slot // pk.tile
            assert pk.local_dst[t, slot % pk.tile] == r[eid] % pk.rows
            assert pk.tile_block[t] == r[eid] // pk.rows
            assert pk.senders_packed[slot] == s[eid]


@pytest.mark.parametrize("n,e,f", [(100, 500, 7), (530, 4000, 140)])
def test_sorted_spmm_matches_dense(rng, n, e, f):
    s, r = random_graph(rng, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    op = SortedSpmm(s, r, n, tile=128, rows=128)
    got = np.asarray(op(jnp.asarray(w), jnp.asarray(x)))
    np.testing.assert_allclose(got, dense(s, r, w, x, n), rtol=1e-4,
                               atol=1e-4)


def test_sorted_spmm_grads(rng):
    n, e, f = 80, 400, 9
    s, r = random_graph(rng, n, e)
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    op = SortedSpmm(s, r, n, tile=128, rows=64)
    sj, rj = jnp.asarray(s, jnp.int32), jnp.asarray(r, jnp.int32)

    gp = jax.grad(lambda w_, x_: jnp.sum(op(w_, x_) ** 2),
                  argnums=(0, 1))(w, x)
    gx = jax.grad(
        lambda w_, x_: jnp.sum(spmm(sj, rj, x_, n, weights=w_) ** 2),
        argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-3, atol=1e-3)


def test_sorted_segment_sum(rng):
    from pytorch_geometric_tpu.ops.sorted_spmm import SortedSegmentSum

    n, e, f = 90, 400, 20
    r = rng.integers(0, n, e)
    msgs = rng.normal(size=(e, f)).astype(np.float32)
    op = SortedSegmentSum(r, n, tile=128, rows=128)
    got = np.asarray(op(jnp.asarray(msgs)))
    want = np.zeros((n, f))
    np.add.at(want, r, msgs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # grad = gather at receivers
    g = jax.grad(lambda m: jnp.sum(op(m) ** 3))(jnp.asarray(msgs))
    want_g = 3 * (want[r] ** 2)
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-3,
                               atol=1e-3)


def test_hybrid_spmm_matches_dense(rng):
    from pytorch_geometric_tpu.ops.hybrid_spmm import HybridSpmm

    n, f = 300, 11
    # half the edges dense in one window-pair, half scattered
    s_dense = rng.integers(0, 64, 400)
    r_dense = rng.integers(0, 64, 400)
    s_sp = rng.integers(0, n, 200)
    r_sp = rng.integers(0, n, 200)
    s = np.concatenate([s_dense, s_sp])
    r = np.concatenate([r_dense, r_sp])
    w = rng.normal(size=600).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    op = HybridSpmm(s, r, n, window=64, tile=128, dense_threshold=100,
                    compute_dtype=jnp.float32)
    assert 0.0 < op.dense_frac < 1.0
    got = np.asarray(op(jnp.asarray(w), jnp.asarray(x)))
    want = dense(s, r, w, x, n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # grads flow through both parts
    g = jax.grad(lambda w_, x_: jnp.sum(op(w_, x_) ** 2),
                 argnums=(0, 1))(jnp.asarray(w), jnp.asarray(x))
    a = np.zeros((n, n)); np.add.at(a, (r, s), w)
    want_gx = 2 * a.T @ (a @ x)
    np.testing.assert_allclose(np.asarray(g[1]), want_gx, rtol=1e-3,
                               atol=1e-3)


def test_sorted_bf16_transposed_out_parity(rng):
    """Round-5: bf16 messages + lane-compact transposed out (F<=64)
    match the f32 reference within bf16 tolerance, fwd and grads."""
    import jax

    n, e, f = 300, 2000, 16
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    op16 = SortedSpmm(s, r, n, tile=128, rows=128,
                      compute_dtype=jnp.bfloat16)
    op32 = SortedSpmm(s, r, n, tile=128, rows=128)
    out16 = np.asarray(op16(jnp.asarray(w), jnp.asarray(x)))
    out32 = np.asarray(op32(jnp.asarray(w), jnp.asarray(x)))
    sc = 1 + np.abs(out32).max()
    np.testing.assert_allclose(out16 / sc, out32 / sc, atol=2e-2)

    g16 = jax.grad(lambda xx: jnp.sum(
        op16(jnp.asarray(w), xx) ** 2))(jnp.asarray(x))
    g32 = jax.grad(lambda xx: jnp.sum(
        op32(jnp.asarray(w), xx) ** 2))(jnp.asarray(x))
    gs = 1 + np.abs(np.asarray(g32)).max()
    np.testing.assert_allclose(np.asarray(g16) / gs,
                               np.asarray(g32) / gs, atol=2e-2)
