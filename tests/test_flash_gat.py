"""FlashGatOperator (ops/flash_gat.py) parity + gradient checks.

The fused Pallas kernels run in interpret mode on CPU (the operator
selects interpret automatically off-TPU), so these tests exercise the
exact kernel bodies — forward vs the sparse segment-softmax GAT path,
backward vs jax.grad of a pure-jnp dense reference, and (rate > 0)
fwd/bwd consistency of the in-kernel dropout regeneration via
directional finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import GATConv, gat_dense_adj
from pytorch_geometric_tpu.ops.flash_gat import FlashGatOperator


def _graph(rng, n=40, e=160, f=6):
    ei = np.unique(np.stack([rng.integers(0, n, e),
                             rng.integers(0, n, e)]), axis=1)
    return from_data(Data(x=rng.normal(size=(n, f)).astype(np.float32),
                          edge_index=ei))


def _inputs(rng, n, H, C):
    d = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    return d, s, h


def _dense_reference(adj, d, s, h, H, C, slope=0.2):
    """Pure-jnp fp32 oracle of the flash kernel's math (no dropout)."""
    n = d.shape[0]
    hv = h.reshape(n, H, C)
    z = d.T[:, :, None] + s.T[:, None, :]              # (H, N, N)
    z = jnp.where(z > 0, z, slope * z)
    z = jnp.where(adj[None], z, -1e9)
    alpha = jax.nn.softmax(z, axis=-1)
    out = jnp.einsum("hij,hjc->hic", alpha, hv.transpose(1, 0, 2))
    return out.transpose(1, 0, 2).reshape(n, H * C)


def test_flash_forward_matches_sparse_gat(rng):
    """Whole-layer GATConv through flash_op == sparse segment path."""
    g = _graph(rng)
    op = FlashGatOperator(np.asarray(gat_dense_adj(g)))
    conv = GATConv(out_channels=5, heads=3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    sparse = np.asarray(conv.apply(params, g, g.x))
    flash = np.asarray(conv.apply(params, g, g.x, flash_op=op))
    nm = np.asarray(g.node_mask)
    # flash aggregates in bf16 on the MXU
    np.testing.assert_allclose(flash[nm], sparse[nm], rtol=2e-2,
                               atol=2e-2)


def test_flash_gradients_match_dense_reference(rng):
    """Custom VJP (rate=0) vs jax.grad of the fp32 jnp oracle."""
    g = _graph(rng)
    adj_np = np.asarray(gat_dense_adj(g))
    op = FlashGatOperator(adj_np)
    H, C = 3, 5
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    proj = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    adj = jnp.asarray(adj_np)

    def loss_flash(d, s, h):
        return jnp.sum(op(d, s, h, 0.0, rate=0.0) * proj)

    def loss_ref(d, s, h):
        return jnp.sum(_dense_reference(adj, d, s, h, H, C) * proj)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(d, s, h)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(d, s, h)
    for a, b, name in zip(gf, gr, ("d", "s", "h")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2,
                                   err_msg=f"grad wrt {name}")


@pytest.mark.parametrize("rate", [0.0, 0.5])
def test_flash_fwd_bwd_consistency(rng, rate):
    """Directional finite difference == VJP, including rate > 0 (the
    backward kernel must regenerate the identical dropout bits from the
    seed rather than store them)."""
    g = _graph(rng)
    op = FlashGatOperator(np.asarray(gat_dense_adj(g)))
    H, C = 2, 4
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    proj = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    seed = 7.0

    def f(h_):
        return jnp.sum(op(d, s, h_, seed, rate=rate) * proj)

    v = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
    gh = jax.grad(f)(h)
    # alpha depends on (d, s, seed) only, so f is exactly linear in h:
    # a large step costs no truncation error and swamps bf16 rounding
    eps = 0.5
    fd = (f(h + eps * v) - f(h - eps * v)) / (2 * eps)
    an = jnp.vdot(gh, v)
    # bf16 matmuls inside the kernel bound the achievable agreement
    assert np.isfinite(float(fd)) and np.isfinite(float(an))
    np.testing.assert_allclose(float(an), float(fd),
                               rtol=5e-2, atol=5e-1)


def test_flash_dropout_statistics(rng):
    """rate > 0 keeps the conditional expectation: averaging over seeds
    approaches the rate=0 output (dropout is on normalised alpha with
    1/(1-rate) rescale, so E[out] == out_rate0 when the denominator is
    held; here we only check closeness, a smoke test of the mask)."""
    g = _graph(rng)
    op = FlashGatOperator(np.asarray(gat_dense_adj(g)))
    H, C = 2, 4
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    base = np.asarray(op(d, s, h, 0.0, rate=0.0))
    outs = [np.asarray(op(d, s, h, float(k), rate=0.5))
            for k in range(1, 9)]
    mean = np.mean(outs, axis=0)
    # different seeds must give different masks
    assert not np.allclose(outs[0], outs[1])
    nm = np.asarray(g.node_mask)
    err = np.abs(mean[nm] - base[nm]).mean()
    scale = np.abs(base[nm]).mean() + 1e-6
    assert err / scale < 0.5, (err, scale)
