"""Segment reductions — the TPU-native torch-scatter.

The reference's every ``MessagePassing.propagate`` aggregation bottoms out
in torch-scatter's ``scatter(src, index, dim, reduce)`` CUDA kernels
(reference: gmm_conv.py:131 + aggr choice at gmm_conv.py:55-58; global
readouts at examples/mutag_gin.py:59).  On TPU the idiomatic form is a
segment reduction with a *static* ``num_segments`` so XLA can compile a
fixed-shape scatter; sorted segment ids (guaranteed by the data layer's
CSR packing) let XLA lower to an efficient sorted-segment reduce.

All functions are pure, jit-safe, and differentiable (XLA derives the
backward: gather for sum/mean, masked gather for max/min).
"""

from functools import partial

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments, indices_are_sorted=False):
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(data, segment_ids, num_segments, indices_are_sorted=False):
    """Mean-reduce rows per segment; empty segments produce 0."""
    totals = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    counts = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], dtype=data.dtype), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted)
    counts = jnp.maximum(counts, 1)
    return totals / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments, indices_are_sorted=False):
    """Max-reduce rows per segment; empty segments produce 0 (like the
    reference's scatter_max fill of the output buffer)."""
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    # segment_max yields -inf for empty segments; match torch-scatter's
    # zero-initialised output semantics.
    return jnp.where(jnp.isneginf(out), 0.0, out) if jnp.issubdtype(
        data.dtype, jnp.floating) else out


def segment_min(data, segment_ids, num_segments, indices_are_sorted=False):
    out = jax.ops.segment_min(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isposinf(out), 0.0, out) if jnp.issubdtype(
        data.dtype, jnp.floating) else out


_REDUCERS = {
    "add": segment_sum,
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
}


def scatter(src, index, num_segments, reduce="add", indices_are_sorted=False):
    """torch-scatter-compatible entry point: ``scatter(src, index, reduce)``
    along dim 0 (the only dim the reference uses)."""
    try:
        fn = _REDUCERS[reduce]
    except KeyError:
        raise ValueError(
            f"Unknown reduce '{reduce}'; expected one of {list(_REDUCERS)}")
    return fn(src, index, num_segments, indices_are_sorted=indices_are_sorted)


def segment_softmax(logits, segment_ids, num_segments,
                    indices_are_sorted=False, mask=None):
    """Numerically stable softmax over entries sharing a segment id.

    This is GAT's edge-attention normaliser: softmax over the incoming
    edges of each target node (reference call stack §3.2: scatter_max +
    scatter_add pair).  ``mask`` (bool per entry) excludes padding edges
    from the normalisation.
    """
    if mask is not None:
        mask = mask.reshape(mask.shape + (1,) * (logits.ndim - mask.ndim))
        logits = jnp.where(mask, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(logits), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted)
    seg_max = jnp.where(jnp.isneginf(seg_max), 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, 0.0)
    denom = jax.ops.segment_sum(
        exp, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return exp / denom[segment_ids]
