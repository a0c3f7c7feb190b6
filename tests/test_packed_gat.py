"""PackedFlashGat (ops/packed_gat.py) parity + gradient checks vs a
dense fp32 oracle and the sparse segment-softmax GAT path (interpret
mode on CPU runs the exact kernel bodies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import GATConv, gat_dense_adj
from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat


def _graph(rng, n=300, e=1200, f=6):
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
    n = d.shape[0]
    hv = h.reshape(n, H, C)
    z = d.T[:, :, None] + s.T[:, None, :]
    z = jnp.where(z > 0, z, slope * z)
    z = jnp.where(adj[None], z, -1e9)
    alpha = jax.nn.softmax(z, axis=-1)
    out = jnp.einsum("hij,hjc->hic", alpha, hv.transpose(1, 0, 2))
    return out.transpose(1, 0, 2).reshape(n, H * C)


def _op(adj_np, window=128, tile=128):
    return PackedFlashGat(adj_np, window=window, tile=tile)


def test_packed_forward_matches_dense_reference(rng):
    g = _graph(rng)
    adj_np = np.asarray(gat_dense_adj(g))
    op = _op(adj_np)
    assert op.E == int(adj_np.sum())
    H, C = 3, 5
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    out = np.asarray(op(d, s, h, 0.0, rate=0.0))
    ref = np.asarray(_dense_reference(jnp.asarray(adj_np), d, s, h, H, C))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_packed_whole_layer_matches_sparse_gat(rng):
    g = _graph(rng)
    op = _op(np.asarray(gat_dense_adj(g)))
    conv = GATConv(out_channels=5, heads=3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    sparse = np.asarray(conv.apply(params, g, g.x))
    packed = np.asarray(conv.apply(params, g, g.x, flash_op=op))
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(packed[nm], sparse[nm], rtol=2e-2,
                               atol=2e-2)


def test_packed_gradients_match_dense_reference(rng):
    g = _graph(rng)
    adj_np = np.asarray(gat_dense_adj(g))
    op = _op(adj_np)
    H, C = 2, 4
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    proj = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    adj = jnp.asarray(adj_np)

    def loss_packed(d, s, h):
        return jnp.sum(op(d, s, h, 0.0, rate=0.0) * proj)

    def loss_ref(d, s, h):
        return jnp.sum(_dense_reference(adj, d, s, h, H, C) * proj)

    gf = jax.grad(loss_packed, argnums=(0, 1, 2))(d, s, h)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(d, s, h)
    for a, b, name in zip(gf, gr, ("d", "s", "h")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2,
                                   err_msg=f"grad wrt {name}")


@pytest.mark.parametrize("rate", [0.0, 0.5])
def test_packed_fwd_bwd_consistency(rng, rate):
    """Directional FD == VJP including dropout (keep bits hashed on the
    original edge id must agree across the three kernels and two edge
    packings)."""
    g = _graph(rng, n=200, e=800)
    op = _op(np.asarray(gat_dense_adj(g)))
    H, C = 2, 4
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    proj = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))

    def f(h_):
        return jnp.sum(op(d, s, h_, 5.0, rate=rate) * proj)

    v = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
    gh = jax.grad(f)(h)
    eps = 0.5        # f linear in h: no truncation error, beats bf16
    fd = (f(h + eps * v) - f(h - eps * v)) / (2 * eps)
    an = jnp.vdot(gh, v)
    np.testing.assert_allclose(float(an), float(fd), rtol=5e-2, atol=5e-1)


def test_packed_nondivisible_and_isolated(rng):
    n, H, C = 150, 2, 3
    adj = np.zeros((n, n), bool)
    ei = np.stack([rng.integers(0, 40, 200), rng.integers(0, 40, 200)])
    adj[ei[1], ei[0]] = True
    np.fill_diagonal(adj, True)
    op = _op(adj, window=64, tile=128)
    d, s, h = _inputs(rng, n, H, C)
    out = np.asarray(op(d, s, h, 0.0, rate=0.0))
    ref = np.asarray(_dense_reference(jnp.asarray(adj), d, s, h, H, C))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    hv = np.asarray(h).reshape(n, H, C)
    np.testing.assert_allclose(out[120].reshape(H, C), hv[120],
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["stream_int8", "stream_bf16"])
def test_packed_streamed_onehot_matches_build(rng, mode):
    """The streamed precomputed one-hot blocks are numerically
    IDENTICAL to the in-kernel iota-compare build (same bf16 one-hot
    feeding the same MXU dots), forward and backward."""
    g = _graph(rng)
    adj_np = np.asarray(gat_dense_adj(g))
    H, C = 3, 5
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    proj = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    op_b = _op(adj_np)
    op_s = PackedFlashGat(adj_np, window=128, tile=128, onehot=mode)

    out_b = np.asarray(op_b(d, s, h, 0.0, rate=0.0))
    out_s = np.asarray(op_s(d, s, h, 0.0, rate=0.0))
    np.testing.assert_allclose(out_s, out_b, rtol=1e-6, atol=1e-6)

    def loss(op, d, s, h):
        return jnp.sum(op(d, s, h, 0.0, rate=0.0) * proj)

    gb = jax.grad(lambda *a: loss(op_b, *a), argnums=(0, 1, 2))(d, s, h)
    gs = jax.grad(lambda *a: loss(op_s, *a), argnums=(0, 1, 2))(d, s, h)
    for a, b in zip(gs, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_packed_eight_head_grads_match_dense(rng):
    """H=8 covers the compact merged-dd backward path (per-tile block
    store + XLA receiver-window segment-sum): EXACT vs the two-kernel
    path, loose-tolerance vs the dense fp32 oracle (bf16 dots)."""
    g = _graph(rng)
    adj_np = np.asarray(gat_dense_adj(g))
    op = _op(adj_np)
    op2 = PackedFlashGat(adj_np, window=128, tile=128, merge_dd=False)
    H, C = 8, 4
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)
    proj = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    adj = jnp.asarray(adj_np)

    def loss(op_, d, s, h):
        return jnp.sum(op_(d, s, h, 0.0, rate=0.0) * proj)

    gm = jax.grad(lambda *a: loss(op, *a), argnums=(0, 1, 2))(d, s, h)
    g2 = jax.grad(lambda *a: loss(op2, *a), argnums=(0, 1, 2))(d, s, h)
    gd_ = jax.grad(lambda *a: loss(
        lambda d, s, h, _seed, rate: _dense_reference(adj, d, s, h, H,
                                                      C), *a),
        argnums=(0, 1, 2))(d, s, h)
    for a, b in zip(gm, g2):   # merged-dd == two-kernel, exactly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
    nm = np.asarray(g.node_mask)   # padding rows: the dense oracle's
    for a, b in zip(gm, gd_):      # -1e9 softmax emits junk there
        a, b = np.asarray(a)[nm], np.asarray(b)[nm]
        # tensor-level relative L2: bf16 transport noise is pointwise
        # heavy-tailed on cancelling sums (median ~1.5%), so elementwise
        # gates mis-measure it; the norm ratio is the training-relevant
        # signal
        rel_l2 = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel_l2 < 0.05, f"grad rel-L2 {rel_l2}"


def test_packed_raw_out_matches_divided_path(rng):
    """raw_out=True returns the undivided num‖den accumulator (the
    bench gathers loss rows from it before the lane-padded division
    chain); dividing it by hand must reproduce the normal output, and
    gradients through a gathered-row loss must agree between paths."""
    g = _graph(rng)
    op = _op(np.asarray(gat_dense_adj(g)))
    H, C = 2, 4
    n = g.num_nodes
    d, s, h = _inputs(rng, n, H, C)

    acc = op(d, s, h, 0.0, rate=0.0, raw_out=True)
    assert acc.shape == (n, H * C + H)
    num, den = acc[:, :H * C], jnp.maximum(acc[:, H * C:], 1e-20)
    manual = np.asarray(num / jnp.repeat(den, C, axis=1))
    full = np.asarray(op(d, s, h, 0.0, rate=0.0))
    np.testing.assert_allclose(manual, full, rtol=1e-5, atol=1e-5)

    rows = jnp.asarray(np.unique(rng.integers(0, n, 40)), jnp.int32)
    proj = jnp.asarray(
        rng.normal(size=(rows.shape[0], H * C)).astype(np.float32))

    def loss_raw(d, s, h):
        a = jnp.take(op(d, s, h, 0.0, rate=0.0, raw_out=True), rows,
                     axis=0)
        nu, de = a[:, :H * C], jnp.maximum(a[:, H * C:], 1e-20)
        return jnp.sum(nu / jnp.repeat(de, C, axis=1) * proj)

    def loss_full(d, s, h):
        return jnp.sum(
            jnp.take(op(d, s, h, 0.0, rate=0.0), rows, axis=0) * proj)

    gr = jax.grad(loss_raw, argnums=(0, 1, 2))(d, s, h)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(d, s, h)
    for a, b, name in zip(gr, gf, ("d", "s", "h")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3,
                                   err_msg=f"grad wrt {name}")


def test_gatconv_raw_out_layer(rng):
    """GATConv(raw_out=True) through the fused backend: same params as
    the normal layer (bias still created), and dividing + bias equals
    the normal fused output."""
    g = _graph(rng)
    op = _op(np.asarray(gat_dense_adj(g)))
    H, C = 3, 5
    conv = GATConv(out_channels=C, heads=H)
    conv_raw = GATConv(out_channels=C, heads=H, raw_out=True)
    params = conv.init(jax.random.PRNGKey(0), g, g.x, flash_op=op)
    params_raw = conv_raw.init(jax.random.PRNGKey(0), g, g.x,
                               flash_op=op)
    assert jax.tree_util.tree_structure(
        params) == jax.tree_util.tree_structure(params_raw)
    out = np.asarray(conv.apply(params, g, g.x, flash_op=op))
    acc = conv_raw.apply(params, g, g.x, flash_op=op)
    nu, de = acc[:, :H * C], jnp.maximum(acc[:, H * C:], 1e-20)
    manual = np.asarray(nu / jnp.repeat(de, C, axis=1)
                        + params["params"]["bias"])
    np.testing.assert_allclose(manual, out, rtol=1e-5, atol=1e-5)


def test_packed_gat_extreme_logits_no_nan(rng):
    """Wide-head regression (round 4): with large logit spreads the old
    GLOBAL softmax shift underflowed entire nodes' denominators and the
    division backward NaN'd training.  The per-receiver shift + H-wide
    den guard must give finite outputs and gradients at extreme logit
    scales (exact parity is not claimable there: the kernels gather
    logits in bf16, and softmax at |z| ~ 150 amplifies the rounding),
    and keep full parity at moderate scales."""
    from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat
    from pytorch_geometric_tpu.ops.segment import (
        segment_softmax,
        segment_sum,
    )

    N, E, H, C = 64, 300, 2, 4
    s = rng.integers(0, N, E)
    r = rng.integers(0, N, E)
    loops = np.arange(N)
    s = np.concatenate([s, loops])
    r = np.concatenate([r, loops])
    op = PackedFlashGat(senders=s, receivers=r, num_nodes=N,
                        window=64, tile=128)
    d0 = rng.normal(size=(N, H)).astype(np.float32)
    s0 = rng.normal(size=(N, H)).astype(np.float32)
    h2 = jnp.asarray(rng.normal(size=(N, H * C)).astype(np.float32))

    # extreme scale (a_s spread ~200 >> f32 exp range): finite only
    d = jnp.asarray(d0 * 60)
    sa = jnp.asarray(s0 * 60)
    out = np.asarray(op(d, sa, h2, 0.0, rate=0.0))
    assert np.isfinite(out).all()
    g = jax.grad(lambda hh: jnp.sum(op(d, sa, hh, 0.0, rate=0.0)
                                    ** 2))(h2)
    assert np.isfinite(np.asarray(g)).all()

    # moderate scale: full parity vs the reference segment-softmax
    d = jnp.asarray(d0 * 4)
    sa = jnp.asarray(s0 * 4)
    out = np.asarray(op(d, sa, h2, 0.0, rate=0.0))
    sj, rj = jnp.asarray(s), jnp.asarray(r)
    z = jax.nn.leaky_relu(jnp.take(sa, sj, axis=0)
                          + jnp.take(d, rj, axis=0), 0.2)
    alpha = segment_softmax(z, rj, N)
    msgs = jnp.take(h2.reshape(N, H, C), sj, axis=0) \
        * alpha[:, :, None]
    ref = np.asarray(segment_sum(msgs, rj, N).reshape(N, H * C))
    np.testing.assert_allclose(out, ref, rtol=6e-2, atol=6e-2)


@pytest.mark.parametrize("C,H", [(8, 1), (8, 8), (64, 4), (256, 2),
                                 (1084, 1), (1084, 8)])
def test_packed_gat_width_head_sweep(rng, C, H):
    """VERDICT round 4 item 9: property sweep over width x heads
    (corners of {8..1084} x {1..8}) asserting (a) finite outputs and
    gradients at extreme logit spreads — the wide-head collapse class —
    and (b) fused-vs-generic parity at moderate spreads."""
    from pytorch_geometric_tpu.ops.packed_gat import PackedFlashGat
    from pytorch_geometric_tpu.ops.segment import (
        segment_softmax,
        segment_sum,
    )

    N, E = 48, 220
    s = rng.integers(0, N, E)
    r = rng.integers(0, N, E)
    loops = np.arange(N)
    s = np.concatenate([s, loops])
    r = np.concatenate([r, loops])
    op = PackedFlashGat(senders=s, receivers=r, num_nodes=N,
                        window=64, tile=128)
    d0 = rng.normal(size=(N, H)).astype(np.float32)
    s0 = rng.normal(size=(N, H)).astype(np.float32)
    h2 = jnp.asarray(rng.normal(size=(N, H * C)).astype(np.float32))

    # extreme spread (~wide-width regime): finite fwd + grads
    d, sa = jnp.asarray(d0 * 60), jnp.asarray(s0 * 60)
    out = np.asarray(op(d, sa, h2, 0.0, rate=0.0))
    assert np.isfinite(out).all(), (C, H)
    g = jax.grad(lambda hh: jnp.sum(op(d, sa, hh, 0.0, rate=0.0)
                                    ** 2))(h2)
    assert np.isfinite(np.asarray(g)).all(), (C, H)

    # moderate spread: parity vs generic segment softmax (fwd + grad)
    d, sa = jnp.asarray(d0 * 3), jnp.asarray(s0 * 3)
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def generic(hh):
        z = jax.nn.leaky_relu(jnp.take(sa, sj, axis=0)
                              + jnp.take(d, rj, axis=0), 0.2)
        alpha = segment_softmax(z, rj, N)
        msgs = jnp.take(hh.reshape(N, H, C), sj, axis=0) \
            * alpha[:, :, None]
        return segment_sum(msgs, rj, N).reshape(N, H * C)

    out = np.asarray(op(d, sa, h2, 0.0, rate=0.0))
    ref = np.asarray(generic(h2))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=6e-2)

    g_f = np.asarray(jax.grad(
        lambda hh: jnp.sum(op(d, sa, hh, 0.0, rate=0.0) ** 2))(h2))
    g_g = np.asarray(jax.grad(lambda hh: jnp.sum(generic(hh) ** 2))(h2))
    gs = max(np.abs(g_g).max(), 1.0)
    np.testing.assert_allclose(g_f / gs, g_g / gs, atol=6e-2)
