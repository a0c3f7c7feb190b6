"""ADMM pruning machinery.

Reference counterpart: utils.py (root) — ``admm_loss`` (:17),
``initialize_Z_and_U`` (:28), ``update_X`` (:39), ``update_Z`` (:47,
percentile projection), ``update_Z_l1`` (:60, soft threshold),
``update_U`` (:76), ``apply_prune``/``prune_weight`` (:85-113),
``print_prune`` (:140).

Pytree-native: "the weights" are every 2-D+ leaf whose path ends in
'weight' or 'kernel'; Z/U are matching sub-pytrees.  All projections are
jit-safe except the percentile (host numpy, like the reference's
np.percentile).
"""

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_weight(path) -> bool:
    last = str(getattr(path[-1], "key", getattr(path[-1], "idx",
                                                path[-1]))).lower()
    return last in ("weight", "kernel") or last.endswith("weight")


def weight_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [(p, leaf) for p, leaf in flat if _is_weight(p)]


def select_weights(params):
    """Mask pytree: weight leaves kept, others None-ed (for Z/U)."""
    def f(path, leaf):
        return leaf if _is_weight(path) else None
    return jax.tree_util.tree_map_with_path(f, params)


def initialize_Z_and_U(params):
    Z = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.array(x) if _is_weight(p) else None, params)
    U = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.zeros_like(x) if _is_weight(p) else None, params)
    return Z, U


def admm_loss(base_loss, params, Z, U, rho: float, alpha: float = 0.0,
              l2: bool = False):
    """base_loss + rho/2 ||W - Z + U|| per weight (reference :17-26
    uses the norm, not its square — matched exactly)."""
    total = base_loss

    def add(path, w, z, u):
        nonlocal total
        if _is_weight(path) and z is not None:
            total = total + rho / 2 * jnp.linalg.norm(
                (w - z + u).reshape(-1))
            if l2:
                total = total + alpha * jnp.linalg.norm(w.reshape(-1))
        return w

    jax.tree_util.tree_map_with_path(add, params, Z, U)
    return total


def update_X(params):
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.array(x) if _is_weight(p) else None, params)


def update_Z(X, U, percent):
    """Percentile hard-threshold projection (host percentile, reference
    :47-57).  ``percent`` is a scalar or per-weight list in traversal
    order."""
    idx = [0]
    percents = percent if isinstance(percent, (list, tuple)) else None

    def f(x, u):
        if x is None:
            return None
        z = np.array(x + u)  # writable host copy
        p = percents[idx[0]] if percents else percent
        idx[0] += 1
        pcen = np.percentile(np.abs(z), 100 * p)
        z[np.abs(z) < pcen] = 0
        return jnp.asarray(z)

    return jax.tree_util.tree_map(f, X, U, is_leaf=lambda v: v is None)


def update_Z_l1(X, U, alpha: float, rho: float):
    """Soft-threshold (L1 proximal) projection (reference :60-73)."""
    delta = alpha / rho

    def f(x, u):
        if x is None:
            return None
        z = x + u
        return jnp.where(z > delta, z - delta,
                         jnp.where(z < -delta, z + delta, 0.0))

    return jax.tree_util.tree_map(f, X, U, is_leaf=lambda v: v is None)


def update_U(U, X, Z):
    def f(u, x, z):
        if u is None:
            return None
        return u + x - z
    return jax.tree_util.tree_map(f, U, X, Z,
                                  is_leaf=lambda v: v is None)


def apply_prune(params, percent):
    """Hard percentile pruning of every weight; returns (pruned_params,
    mask_pytree) (reference :85-113)."""
    idx = [0]
    percents = percent if isinstance(percent, (list, tuple)) else None
    masks = {}

    def f(path, w):
        if not _is_weight(path):
            return w
        p = percents[idx[0]] if percents else percent
        idx[0] += 1
        wn = np.asarray(w)
        pcen = np.percentile(np.abs(wn), 100 * p)
        mask = jnp.asarray(np.abs(wn) >= pcen, dtype=w.dtype)
        name = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in path)
        masks[name] = mask
        return w * mask

    out = jax.tree_util.tree_map_with_path(f, params)
    return out, masks


def apply_masks(params, masks: Dict[str, jnp.ndarray]):
    """Re-apply saved masks after a gradient step (masked retraining)."""
    def f(path, w):
        name = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in path)
        return w * masks[name] if name in masks else w
    return jax.tree_util.tree_map_with_path(f, params)


def print_prune(params) -> float:
    """Report sparsity; returns overall pruned fraction (reference
    :140-152)."""
    pruned = total = 0
    for path, w in weight_paths(params):
        wn = np.asarray(w)
        nz = int((wn != 0).sum())
        name = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                        for q in path)
        print(f"[{name}] pruned {100 * (wn.size - nz) / wn.size:.2f}% "
              f"({nz}/{wn.size} nonzero)")
        pruned += wn.size - nz
        total += wn.size
    frac = pruned / max(total, 1)
    print(f"total pruned: {pruned}/{total} ({100 * frac:.2f}%)")
    return frac
