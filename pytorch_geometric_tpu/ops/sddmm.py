"""SDDMM-shaped ops: per-edge scores from endpoint features.

Reference counterpart: GAT's per-edge attention logits
``alpha_ij = f(x_i, x_j)`` (reference call stack SURVEY §3.2) and the
dense-sampled dot products in AGNN / DNA attention.  On TPU these are
gathers + an elementwise/contraction step that XLA fuses; a Pallas
variant only pays off fused with segment-softmax (round 2).
"""

import jax.numpy as jnp


def edge_gather(x, index):
    """Per-edge gather of node rows: x_j = x[index] (reference
    MessagePassing gather step, SURVEY §3.5)."""
    return jnp.take(x, index, axis=0)


def sddmm(senders, receivers, a, b=None):
    """Per-edge dot products: out[e] = <a[senders[e]], b[receivers[e]]>.

    ``a``/``b``: (N, F) or (N, H, F) for multi-head; returns (E,) or
    (E, H).
    """
    if b is None:
        b = a
    ai = jnp.take(a, senders, axis=0)
    bj = jnp.take(b, receivers, axis=0)
    return jnp.sum(ai * bj, axis=-1)
