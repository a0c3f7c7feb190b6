"""Per-op parity tests for segment reductions vs dense references
(the upstream-style unit layer the reference fork dropped, SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.ops import (
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
    scatter,
)


def dense_reduce(data, ids, n, op):
    out = np.zeros((n,) + data.shape[1:], dtype=np.float64)
    touched = np.zeros(n, dtype=bool)
    for i, s in enumerate(ids):
        if not touched[s]:
            out[s] = data[i]
            touched[s] = True
        elif op == "sum":
            out[s] += data[i]
        elif op == "max":
            out[s] = np.maximum(out[s], data[i])
        elif op == "min":
            out[s] = np.minimum(out[s], data[i])
    if op == "sum":
        out = np.zeros((n,) + data.shape[1:], dtype=np.float64)
        np.add.at(out, ids, data)
    return out


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_segment_reduce_matches_dense(rng, reduce):
    E, N, F = 257, 37, 5
    data = rng.normal(size=(E, F)).astype(np.float32)
    ids = rng.integers(0, N, size=E)
    got = np.asarray(scatter(jnp.asarray(data), jnp.asarray(ids), N,
                             reduce=reduce))
    if reduce == "mean":
        sums = dense_reduce(data, ids, N, "sum")
        cnt = np.maximum(np.bincount(ids, minlength=N), 1)[:, None]
        want = sums / cnt
    else:
        want = dense_reduce(data, ids, N, reduce if reduce != "sum"
                            else "sum")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_empty_segments_zero(rng):
    data = rng.normal(size=(4, 3)).astype(np.float32)
    ids = np.array([0, 0, 2, 2])
    for fn in (segment_sum, segment_mean, segment_max, segment_min):
        out = np.asarray(fn(jnp.asarray(data), jnp.asarray(ids), 5))
        assert out.shape == (5, 3)
        np.testing.assert_array_equal(out[1], 0.0)
        np.testing.assert_array_equal(out[3:], 0.0)


def test_segment_softmax_matches_dense(rng):
    E, N = 64, 9
    logits = rng.normal(size=E).astype(np.float32) * 3
    ids = np.sort(rng.integers(0, N, size=E))
    got = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids),
                                     N, indices_are_sorted=True))
    want = np.zeros_like(logits)
    for s in range(N):
        m = ids == s
        if m.any():
            e = np.exp(logits[m] - logits[m].max())
            want[m] = e / e.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # each segment sums to 1
    sums = np.zeros(N)
    np.add.at(sums, ids, got)
    present = np.isin(np.arange(N), ids)
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_segment_softmax_multihead_mask(rng):
    E, N, H = 40, 6, 4
    logits = rng.normal(size=(E, H)).astype(np.float32)
    ids = rng.integers(0, N, size=E)
    mask = rng.random(E) > 0.3
    got = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids),
                                     N, mask=jnp.asarray(mask)))
    assert got.shape == (E, H)
    np.testing.assert_array_equal(got[~mask], 0.0)
    sums = np.zeros((N, H))
    np.add.at(sums, ids, got)
    for s in range(N):
        if (mask & (ids == s)).any():
            np.testing.assert_allclose(sums[s], 1.0, rtol=1e-5)
