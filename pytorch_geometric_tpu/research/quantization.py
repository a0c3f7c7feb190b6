"""Weight quantization.

Reference counterpart: quantization.py — ``quantize`` (:80, power-of-two
level sets {±1}, {±1,±2}, ... scaled by alpha), ``mapping`` (:200,
G = alpha * Q), ``ADMM_quantization`` (:279, alternating projection with
an ADMM dual), ``direct_quantize`` (:455, alpha = mean |W|),
``dorefa_quantize`` (:473) and ``dorefa_fw`` (:480).

jnp implementations; all jit-safe.  ``kbits`` follows the reference's
level-count naming (3 => {-1,0,1}, 5 => ±{0,1,2}, 7 => ±{0,1,2,4},
9 => ±{0,1,2,4,8}).
"""

from typing import Optional

import jax
import jax.numpy as jnp

_LEVELS = {3: (1,), 5: (1, 2), 7: (1, 2, 4), 9: (1, 2, 4, 8)}


def quantize(V, alpha, kbits: int = 3):
    """Round V onto the power-of-two level set (reference :80-180: value
    thresholds are the midpoints alpha/2, 3 alpha/2, 3 alpha, 6 alpha)."""
    if kbits not in _LEVELS:
        raise ValueError(f"kbits must be in {sorted(_LEVELS)}")
    levels = _LEVELS[kbits]
    q = jnp.zeros_like(V)
    # thresholds: midpoint between consecutive levels (0, l1, l2, ...)
    lvls = (0,) + levels
    for i in range(1, len(lvls)):
        lo_mid = (lvls[i - 1] + lvls[i]) / 2.0 * alpha
        q = jnp.where(V > lo_mid, float(lvls[i]), q)
        q = jnp.where(V < -lo_mid, -float(lvls[i]), q)
    return q


def mapping(Q, alpha):
    return alpha * Q


def direct_quantize(param, kbits: int = 3):
    """alpha = mean |W|; one-shot quantize + map (reference :455-471)."""
    alpha = jnp.mean(jnp.abs(param))
    return mapping(quantize(param, alpha, kbits), alpha)


def dorefa_quantize(param, kbits: int = 8):
    """k-bit uniform rounding in [0,1] (reference :473-478; here kbits
    is a bit count)."""
    n = float(2 ** kbits - 1)
    return jnp.round(param * n) / n


def dorefa_fw(param, bitW: int = 8):
    """DoReFa forward weight quantization (reference :480-486)."""
    x = jnp.tanh(param)
    x = x / jnp.max(jnp.abs(x)) * 0.5 + 0.5
    return 2.0 * dorefa_quantize(x, bitW) - 1.0


def admm_quantization(weight, kbits: int = 3, iters: int = 30):
    """Optimal scaled projection onto the quantized set (the goal of the
    reference's ADMM loop :279-370, minus the Hessian weighting):
    alternate  Q <- quantize(W; alpha)  and the least-squares scale
    alpha <- <Q, W>/<Q, Q>  until fixed point.  Returns (G, alpha)."""
    alpha0 = jnp.mean(jnp.abs(weight)) + 1e-12

    def body(alpha, _):
        Q = quantize(weight, alpha, kbits)
        denom = jnp.sum(Q * Q) + 1e-12
        alpha_new = jnp.abs(jnp.sum(Q * weight) / denom) + 1e-12
        return alpha_new, None

    alpha, _ = jax.lax.scan(body, alpha0, None, length=iters)
    Q = quantize(weight, alpha, kbits)
    return mapping(Q, alpha), alpha


def quantize_params(params, kbits: int = 3, method: str = "direct"):
    """Quantize every 2-D+ weight leaf of a pytree."""
    from pytorch_geometric_tpu.research.admm import _is_weight

    def f(path, w):
        if not _is_weight(path) or w.ndim < 2:
            return w
        if method == "direct":
            return direct_quantize(w, kbits)
        if method == "dorefa":
            return dorefa_fw(w, kbits)
        if method == "admm":
            return admm_quantization(w, kbits)[0]
        raise ValueError(method)

    return jax.tree_util.tree_map_with_path(f, params)
