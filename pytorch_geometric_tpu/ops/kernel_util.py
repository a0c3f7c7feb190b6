"""Shared in-kernel helpers for the packed Pallas operators.

The (tile, window) gather/scatter one-hots are the dominant VPU cost of
every packed kernel (~0.5 us each at 256x1024 in int32).  Building them
with int16 iota compares packs two lanes per 32-bit vreg — half the
vector ops — and is exact for any window < 32768 (locals are
window-relative, so the value range is [0, window)).
"""

import jax
import jax.numpy as jnp
import numpy as np


def iota_rows(window: int):
    """Host-side (8, window) int32 column-index rows, passed to packed
    kernels as a constant VMEM block (index map (0, 0)) so the column
    iota is materialised once instead of regenerated at every grid
    step.  (v5e's VPU has no 16-bit iota and no 16-bit compare, so the
    lane-packed int16 variant is not available on this target.)"""
    # numpy, not jnp: _build may run lazily inside a jit trace, and a
    # jnp constant created there would leak a tracer into the cached
    # closure (pallas_call converts the numpy array per call)
    return np.ascontiguousarray(
        np.broadcast_to(np.arange(window, dtype=np.int32), (8, window)))


def edge_onehot(locals_i32, cols_ref, tile: int, window: int,
                dtype=jnp.bfloat16):
    """(tile, window) one-hot of per-edge window-local indices.

    ``locals_i32``: (tile,) int32 window-local slots in [0, window).
    ``cols_ref``: an (8, >= window) int32 block from :func:`iota_rows`
    (asymmetric-window kernels share one iota sized to the wider
    window and slice here).  Padding slots may hold any in-range value
    — callers zero their contribution via edge weights / masks, not
    via the one-hot.
    """
    return (locals_i32[:, None]
            == cols_ref[0:1, :window]).astype(dtype)


def onehot_blocks(locals_2d, tile: int, window: int,
                  dtype=jnp.bfloat16):
    """Precompute every tile's (tile, window) one-hot as ONE device
    array of shape (T8*tile, window), built on device in a single
    vectorised pass.

    Streaming these blocks into the kernel (BlockSpec indexed by the
    grid step) replaces the in-kernel iota-compare build — ~2 VPU ops
    per (edge, window-slot) — with an HBM read the DMA engines overlap
    under the MXU work.  Worth it when the kernel is VPU-bound (thin
    feature columns) and the total block bytes fit HBM:
    T*tile*window bytes at int8 (~140 MB per pack side at MUTAG/PubMed
    scale).  Semantics identical to :func:`edge_onehot`: padding slots
    one-hot their (harmless) local value; callers mask via weights.

    MUST be called inside the caller's trace (not eagerly at operator
    build): a concrete multi-hundred-MB device array closed over a jit
    is serialized into the compile payload (the remote compiler rejects
    >600 MB bodies), while this traced one-pass build is hoisted out of
    the epoch scan by XLA's while-loop invariant code motion — built
    once per program, resident in HBM, reused by every grid step.
    """
    locals_2d = jnp.asarray(locals_2d)
    T8 = int(locals_2d.shape[0])
    flat = locals_2d.reshape(T8 * tile, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    return (flat == cols).astype(dtype)
