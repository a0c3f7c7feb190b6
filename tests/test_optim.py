"""adam_compact (bf16-moment Adam, utils/optim.py) vs optax.adam:
trajectory stays close over many steps and optimises to the same
solution on a convex problem."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.utils.optim import adam_compact


def _quadratic_problem(seed=0, d=64):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(d, d)).astype(np.float32)
    A = A @ A.T / d + np.eye(d, dtype=np.float32)
    b = rng.normal(size=d).astype(np.float32)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def loss(p):
        return 0.5 * p @ Aj @ p - bj @ p

    x0 = jnp.asarray(rng.normal(size=d).astype(np.float32))
    return loss, x0, np.linalg.solve(A, b)


def _run(tx, loss, x0, steps):
    p = x0
    st = tx.init(p)

    @jax.jit
    def step(p, st):
        g = jax.grad(loss)(p)
        u, st = tx.update(g, st, p)
        return optax.apply_updates(p, u), st

    for _ in range(steps):
        p, st = step(p, st)
    return np.asarray(p)


def test_adam_compact_matches_optax_trajectory():
    loss, x0, _ = _quadratic_problem()
    ours = _run(adam_compact(0.05), loss, x0, 50)
    ref = _run(optax.adam(0.05), loss, x0, 50)
    # bf16 moments cost <1% drift over 50 steps
    np.testing.assert_allclose(ours, ref, rtol=0.03, atol=0.03)


def test_adam_compact_converges_to_solution():
    loss, x0, sol = _quadratic_problem(seed=1)
    ours = _run(adam_compact(0.1), loss, x0, 800)
    assert np.max(np.abs(ours - sol)) < 0.05


def test_adam_compact_state_dtype():
    tx = adam_compact(0.01)
    p = {"w": jnp.ones((4, 4))}
    st = tx.init(p)
    assert st.mu["w"].dtype == jnp.bfloat16
    assert st.nu["w"].dtype == jnp.bfloat16
