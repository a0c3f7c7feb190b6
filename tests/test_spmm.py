"""SpMM parity: XLA path and Pallas windowed one-hot kernel vs dense
adjacency matmul, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.ops.pack import pack_windows
from pytorch_geometric_tpu.ops.spmm import SpmmOperator, spmm


def random_graph(rng, n, e):
    senders = rng.integers(0, n, size=e)
    receivers = rng.integers(0, n, size=e)
    order = np.argsort(receivers, kind="stable")
    return senders[order], receivers[order]


def dense_spmm(senders, receivers, w, x, n):
    a = np.zeros((n, n), dtype=np.float64)
    np.add.at(a, (receivers, senders), w)
    return a @ x


def test_spmm_xla_matches_dense(rng):
    N, E, F = 50, 300, 7
    s, r = random_graph(rng, N, E)
    w = rng.normal(size=E).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    got = np.asarray(spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(x),
                          N, weights=jnp.asarray(w),
                          indices_are_sorted=True))
    want = dense_spmm(s, r, w, x, N)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pack_windows_covers_all_edges(rng):
    N, E = 700, 4000
    s, r = random_graph(rng, N, E)
    pk = pack_windows(s, r, N, window=256, tile=128)
    # every original edge id appears exactly once in perm
    real = pk.perm[pk.perm < E]
    assert sorted(real.tolist()) == list(range(E))
    assert pk.local_src.shape == (pk.num_tiles, 128)
    # all dst windows initialised
    assert set(pk.tile_dst_win[pk.tile_first == 1].tolist()) == \
        set(range(pk.num_dst_windows))


@pytest.mark.parametrize("n,e,f", [(100, 600, 5), (521, 3000, 140)])
def test_spmm_pallas_matches_dense(rng, n, e, f):
    s, r = random_graph(rng, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    op = SpmmOperator(s, r, n, window=128, tile=128)
    got = np.asarray(op(jnp.asarray(w), jnp.asarray(x)))
    want = dense_spmm(s, r, w, x, n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spmm_pallas_grad_matches_xla(rng):
    n, e, f = 60, 240, 9
    s, r = random_graph(rng, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    op = SpmmOperator(s, r, n, window=64, tile=128)
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def loss_pallas(w_, x_):
        return jnp.sum(op(w_, x_) ** 2)

    def loss_xla(w_, x_):
        return jnp.sum(spmm(sj, rj, x_, n, weights=w_) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(w),
                                               jnp.asarray(x))
    gx = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(w), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-3, atol=1e-3)


def test_spmm_bind_static_weights(rng):
    n, e, f = 90, 500, 9
    s, r = random_graph(rng, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    op = SpmmOperator(s, r, n, window=64, tile=128)
    bound = op.bind(jnp.asarray(w))
    got = np.asarray(bound(x))
    np.testing.assert_allclose(got, dense_spmm(s, r, w, x, n), rtol=1e-4,
                               atol=1e-4)
    g = jax.grad(lambda x_: jnp.sum(bound(x_) ** 2))(x)
    a = np.zeros((n, n)); np.add.at(a, (r, s), w)
    want = 2 * a.T @ (a @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-3, atol=1e-3)


def test_asymmetric_windows_parity(rng):
    """Round-5 scattered-tail lever: wide src window + narrow dst
    window must be numerically identical to the symmetric operator,
    fwd and grads, on both the closure and explicit-args paths."""
    import jax

    n, e, f = 900, 4000, 16
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    wj = jnp.asarray(w)

    ref = SpmmOperator(s, r, n, window=256, tile=128)
    want = np.asarray(ref(wj, x))
    for ws, wd in ((512, 128), (512, 256), (128, 512)):
        op = SpmmOperator(s, r, n, window=ws, tile=128, window_dst=wd)
        got = np.asarray(op(wj, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # gradient (exercises the swapped bwd pack)
        g_ref = jax.grad(lambda xx: jnp.sum(ref(wj, xx) ** 2))(x)
        g = jax.grad(lambda xx: jnp.sum(op(wj, xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)
        # explicit-args static-weight path (the BlockSpmm remainder)
        fn, consts = op.bind_external(w)
        got2 = np.asarray(jax.jit(fn)(consts, x))
        np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-4)
        g2 = jax.grad(lambda xx: jnp.sum(fn(consts, xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)
