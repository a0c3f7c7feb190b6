"""SGD with algebraic-connectivity (Fiedler) regularisation.

Reference counterpart: sgd.py — ``AlgebraicConnectivity`` (:6-12) and an
``SGD.step`` whose weight-decay term ``d_p = wd * p`` is replaced by
``wd * fiedler_penalty_gradient`` (:74-119 with the vendored Optimizer
base in optimizer.py).

TPU-native form: an optax gradient transformation.  The reference
computes, per 2-D weight W, the algebraic connectivity lambda_2 of the
bipartite graph of |W| and pushes weights toward larger connectivity;
here the penalty gradient is d/dW of lambda_2(normalised Laplacian of
the bipartite graph), obtained in closed form from the Fiedler vector
(eigenvalue perturbation: d lambda/d w_ij = v_i^2 deg-term approximated
by the unnormalised Laplacian identity (v_i - v_j)^2 — the standard
differentiable surrogate).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def algebraic_connectivity(weight: jnp.ndarray):
    """lambda_2 and Fiedler vector of the bipartite graph Laplacian of
    |W| (reference sgd.py:6-12 builds the same block adjacency)."""
    M, N = weight.shape
    aw = jnp.abs(weight)
    # block adjacency [[0, W],[W^T, 0]]
    deg = jnp.concatenate([aw.sum(1), aw.sum(0)])
    n = M + N
    adj = jnp.zeros((n, n), weight.dtype)
    adj = adj.at[:M, M:].set(aw)
    adj = adj.at[M:, :M].set(aw.T)
    lap = jnp.diag(deg) - adj
    w, v = jnp.linalg.eigh(lap)
    return w[1], v[:, 1]


def _fiedler_penalty(weight):
    lam2, _ = algebraic_connectivity(weight)
    return -lam2  # maximise connectivity == minimise -lambda_2


class FiedlerSGDState(NamedTuple):
    momentum: optax.TraceState


def fiedler_sgd(learning_rate: float, fiedler_coeff: float = 1e-4,
                momentum: float = 0.9, nesterov: bool = False,
                min_dim: int = 2):
    """SGD where weight decay is replaced by the Fiedler regulariser on
    every 2-D weight (reference sgd.py:95-105)."""

    trace = optax.trace(decay=momentum, nesterov=nesterov)

    def init_fn(params):
        return FiedlerSGDState(momentum=trace.init(params))

    def update_fn(updates, state, params=None):
        if params is not None and fiedler_coeff:
            def add_reg(g, p):
                if p.ndim == 2 and min(p.shape) >= min_dim:
                    reg = jax.grad(_fiedler_penalty)(p)
                    return g + fiedler_coeff * reg
                return g
            updates = jax.tree_util.tree_map(add_reg, updates, params)
        updates, mom = trace.update(updates, state.momentum, params)
        updates = jax.tree_util.tree_map(
            lambda u: -learning_rate * u, updates)
        return updates, FiedlerSGDState(momentum=mom)

    return optax.GradientTransformation(init_fn, update_fn)
