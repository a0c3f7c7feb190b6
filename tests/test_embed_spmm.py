"""EmbedSpmm (sorted-scatter backward) parity with the plain
take+segment_sum RGCN paths, forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import RGCNConv
from pytorch_geometric_tpu.nn.conv.rgcn_conv import (
    rgcn_fused_op,
    rgcn_norm,
)
from pytorch_geometric_tpu.ops.embed_spmm import EmbedSpmm


def _graph(rng, n=30, e=120, R=5):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    et = rng.integers(0, R, e)
    g = from_data(Data(edge_index=ei, edge_type=et, num_nodes=n))
    return g, g.extras["edge_type"]


def test_embed_spmm_matches_reference(rng):
    T, N, E, C = 40, 25, 200, 6
    ids = rng.integers(0, T, E)
    recv = rng.integers(0, N, E)
    w = rng.normal(size=E).astype(np.float32)
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    op = EmbedSpmm(ids, recv, T, N, weights=w)

    def ref(t):
        msgs = jnp.take(t, jnp.asarray(ids), axis=0) \
            * jnp.asarray(w)[:, None]
        return jax.ops.segment_sum(msgs, jnp.asarray(recv),
                                   num_segments=N)

    np.testing.assert_allclose(np.asarray(op(table)),
                               np.asarray(ref(table)), rtol=1e-5,
                               atol=1e-5)
    g1 = jax.grad(lambda t: jnp.sum(op(t) ** 2))(table)
    g2 = jax.grad(lambda t: jnp.sum(ref(t) ** 2))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_rgcn_fused_embed_mode(rng):
    g, et = _graph(rng)
    R, n = 5, g.num_nodes
    norm = rgcn_norm(g, et, R)
    conv = RGCNConv(n, 4, R, num_bases=3)
    params = conv.init(jax.random.PRNGKey(0), g, None, et, norm=norm)
    op = rgcn_fused_op(g, et, R, "embed", in_channels=n,
                       norm=np.asarray(norm))
    plain = conv.apply(params, g, None, et, norm=norm)
    fused = conv.apply(params, g, None, et, norm=norm, fused_op=op)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda p: jnp.sum(conv.apply(
        p, g, None, et, norm=norm, fused_op=op) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(conv.apply(
        p, g, None, et, norm=norm) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_rgcn_fused_transform_mode(rng):
    g, et = _graph(rng)
    R = 5
    norm = rgcn_norm(g, et, R)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(
        np.float32))
    conv = RGCNConv(16, 4, R, num_bases=3)
    params = conv.init(jax.random.PRNGKey(1), g, x, et, norm=norm)
    op = rgcn_fused_op(g, et, R, "transform", norm=np.asarray(norm))
    a = conv.apply(params, g, x, et, norm=norm)
    b = conv.apply(params, g, x, et, norm=norm, fused_op=op)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                               atol=1e-5)
    ga = jax.grad(lambda xx: jnp.sum(conv.apply(
        params, g, xx, et, norm=norm) ** 2))(x)
    gb = jax.grad(lambda xx: jnp.sum(conv.apply(
        params, g, xx, et, norm=norm, fused_op=op) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-4, atol=1e-5)


def test_packed_rgcn_matches_xla_backend(rng):
    """PackedRgcnSpmm (one-hot MXU kernels, interpret mode on CPU) ==
    RgcnBasisSpmm forward and gradients."""
    g, et = _graph(rng, n=90, e=400, R=5)
    R = 5
    norm = rgcn_norm(g, et, R)
    conv = RGCNConv(16, 4, R, num_bases=3)
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(
        np.float32))
    params = conv.init(jax.random.PRNGKey(1), g, x, et, norm=norm)
    op_x = rgcn_fused_op(g, et, R, "transform", norm=np.asarray(norm))
    op_p = rgcn_fused_op(g, et, R, "transform", norm=np.asarray(norm),
                         backend="packed", window=64, tile=128)
    a = conv.apply(params, g, x, et, norm=norm, fused_op=op_x)
    b = conv.apply(params, g, x, et, norm=norm, fused_op=op_p)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-2,
                               atol=2e-2)
    ga = jax.grad(lambda p: jnp.sum(conv.apply(
        p, g, x, et, norm=norm, fused_op=op_x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(conv.apply(
        p, g, x, et, norm=norm, fused_op=op_p) ** 2))(params)
    for u, v in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        u, v = np.asarray(u), np.asarray(v)
        # bf16 scatter matmuls: tolerance relative to the grad scale
        np.testing.assert_allclose(v, u, rtol=3e-2,
                                   atol=1e-2 * np.abs(u).max())


def test_packed_rgcn_embed_mode(rng):
    g, et = _graph(rng, n=90, e=400, R=5)
    R, n = 5, g.num_nodes
    norm = rgcn_norm(g, et, R)
    conv = RGCNConv(n, 4, R, num_bases=3)
    params = conv.init(jax.random.PRNGKey(0), g, None, et, norm=norm)
    plain = conv.apply(params, g, None, et, norm=norm)
    op_p = rgcn_fused_op(g, et, R, "embed", in_channels=n,
                         norm=np.asarray(norm), backend="packed",
                         window=64, tile=128)
    fused = conv.apply(params, g, None, et, norm=norm, fused_op=op_p)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=2e-2, atol=2e-2)
    g1 = jax.grad(lambda p: jnp.sum(conv.apply(
        p, g, None, et, norm=norm, fused_op=op_p) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(conv.apply(
        p, g, None, et, norm=norm) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2)


def test_packed_rgcn_streamed_onehot_matches_build(rng):
    """onehot='stream_int8'/'stream_bf16' (precomputed DMA'd one-hot
    blocks) is numerically IDENTICAL to the in-kernel build."""
    import pytest
    g, et = _graph(rng, n=90, e=400, R=5)
    R = 5
    norm = rgcn_norm(g, et, R)
    base = rgcn_fused_op(g, et, R, "transform", norm=np.asarray(norm),
                         backend="packed", window=64, tile=128)
    xB = jnp.asarray(rng.normal(size=(g.num_nodes, 3 * 4)).astype(
        np.float32))
    att = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    ref = np.asarray(base(xB, att))
    gref = jax.grad(lambda x, a: jnp.sum(base(x, a) ** 2),
                    argnums=(0, 1))(xB, att)
    for mode in ("stream_int8", "stream_bf16"):
        op = rgcn_fused_op(g, et, R, "transform", norm=np.asarray(norm),
                           backend="packed", window=64, tile=128,
                           onehot=mode)
        np.testing.assert_allclose(np.asarray(op(xB, att)), ref,
                                   rtol=1e-6, atol=1e-6)
        gs = jax.grad(lambda x, a: jnp.sum(op(x, a) ** 2),
                      argnums=(0, 1))(xB, att)
        for a, b in zip(gs, gref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


def test_packed_rgcn_out_orientations_match(rng):
    """out_t=True (lane-compact transposed accumulator) == out_t=False
    (row-major (window, C) blocks) — same kernel math, different
    output block orientation."""
    from pytorch_geometric_tpu.ops.packed_rgcn import PackedRgcnSpmm

    g, et = _graph(rng, n=90, e=400, R=5)
    norm = rgcn_norm(g, et, 5)
    emask = np.asarray(g.real_edge_mask())
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    w = np.asarray(norm) * emask
    B, C = 3, 4
    xB = jnp.asarray(rng.normal(size=(g.num_nodes, B * C))
                     .astype(np.float32))
    att = jnp.asarray(rng.normal(size=(5, B)).astype(np.float32))
    kw = dict(window=128, tile=128)
    op_t = PackedRgcnSpmm(s, r, np.asarray(et), 5, g.num_nodes, w,
                          out_t=True, **kw)
    op_n = PackedRgcnSpmm(s, r, np.asarray(et), 5, g.num_nodes, w,
                          out_t=False, **kw)
    a = op_t(xB, att)
    b = op_n(xB, att)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    ga = jax.grad(lambda x_: jnp.sum(op_t(x_, att) ** 2))(xB)
    gb = jax.grad(lambda x_: jnp.sum(op_n(x_, att) ** 2))(xB)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-4)
