"""Self-loop edits (reference: torch_geometric.utils.remove_self_loops,
examples/qm9_nn_conv.py:11,43; add_self_loops inside GCNConv's norm).

TPU note: these change the static edge count, so they run either on host
numpy (loader-time) or inside jit with a *fixed* growth (+N for add).
Removal inside jit keeps shapes by masking instead of compacting.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def add_self_loops(senders, receivers, num_nodes: int, edge_weight=None,
                   fill_value: float = 1.0):
    """Append one self loop per node (E -> E + N, statically)."""
    loop = jnp.arange(num_nodes, dtype=senders.dtype)
    senders = jnp.concatenate([senders, loop])
    receivers = jnp.concatenate([receivers, loop])
    if edge_weight is not None:
        fill = jnp.full((num_nodes,), fill_value, dtype=edge_weight.dtype)
        edge_weight = jnp.concatenate([edge_weight, fill])
    return senders, receivers, edge_weight


def remove_self_loops(senders, receivers, edge_attr=None):
    """Compacting removal — host/loader-time only (dynamic output size).
    Inside jit, use :func:`self_loop_mask` and mask instead."""
    import jax.core
    if isinstance(senders, jax.core.Tracer):
        raise ValueError(
            "remove_self_loops changes the edge count and cannot run under "
            "jit; use self_loop_mask() and mask edges instead.")
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    keep = senders != receivers
    ea = None if edge_attr is None else np.asarray(edge_attr)[keep]
    return senders[keep], receivers[keep], ea


def self_loop_mask(senders, receivers):
    """jit-safe boolean mask of non-self-loop edges."""
    return senders != receivers


def contains_self_loops(senders, receivers) -> bool:
    return bool(np.any(np.asarray(senders) == np.asarray(receivers)))
