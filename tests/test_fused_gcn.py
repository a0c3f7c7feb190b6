"""Fused 2-layer GCN kernel (ops/fused_gcn.py): one pallas launch per
direction vs an XLA reference with the identical dropout hash —
forward and all parameter gradients (round 5, the PubMed launch-floor
lever)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.ops.fused_gcn import (
    FusedGcn2,
    _host_keep_mask,
)


@pytest.mark.parametrize("rate", [0.0, 0.5])
def test_fused_gcn2_matches_xla_reference(rng, rate):
    N, E, H, C = 700, 4000, 16, 3
    s = rng.integers(0, N, E)
    r = rng.integers(0, N, E)
    w = rng.normal(size=E).astype(np.float32)
    z1 = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
    seed = jnp.float32(12345.0)

    op = FusedGcn2(s, r, N, w, hidden=H, classes=C, window=128,
                   tile=128, dropout_rate=rate)
    out = np.asarray(op(z1, W2, b1, seed))

    def ref_fn(z1, W2, b1):
        def agg(v):
            m = jnp.take(v, jnp.asarray(s), axis=0) \
                * jnp.asarray(w)[:, None]
            return jax.ops.segment_sum(m, jnp.asarray(r),
                                       num_segments=N)
        h1p = agg(z1)
        h = jnp.maximum(h1p + b1[None, :], 0.0)
        if rate > 0:
            keep = _host_keep_mask(seed, H, N, 128, rate)
            h = jnp.where(keep, h / (1 - rate), 0.0)
        return agg(h @ W2)

    want = np.asarray(ref_fn(z1, W2, b1))
    sc = 1 + np.abs(want).max()
    np.testing.assert_array_less(np.abs(out - want).max() / sc, 2e-2)

    g_f = jax.grad(lambda a, b, c: jnp.sum(op(a, b, c, seed) ** 2),
                   argnums=(0, 1, 2))(z1, W2, b1)
    g_r = jax.grad(lambda a, b, c: jnp.sum(ref_fn(a, b, c) ** 2),
                   argnums=(0, 1, 2))(z1, W2, b1)
    for name, a, b in zip(("dz1", "dW2", "db1"), g_f, g_r):
        a, b = np.asarray(a), np.asarray(b)
        sc = 1 + np.abs(b).max()
        # max tolerates relu-boundary flips from bf16 h1_pre (the
        # known fused-vs-generic class); the mean gate catches real
        # bugs
        assert np.abs(a - b).mean() / sc < 3e-3, name
        assert np.abs(a - b).max() / sc < 8e-2, name
