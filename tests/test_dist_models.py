"""Distributed nn-API models (parallel/api.py + parallel/models.py):
multi-layer GCN/SAGE/GAT built from the public conv modules over an
edge partition, forward + full-train-step parity vs single-device
references on the virtual 8-device mesh (VERDICT round 3, item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_geometric_tpu.ops.segment import segment_sum
from pytorch_geometric_tpu.ops.spmm import spmm
from pytorch_geometric_tpu.parallel.api import GraphPartition
from pytorch_geometric_tpu.parallel.models import (
    DistGAT,
    DistGCN,
    DistSAGE,
)

P_DEV = 4


def _problem(seed=0, N=300, E=2400, F=10, C=4):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    keep = src != dst          # GraphPartition appends self loops
    src, dst = src[keep], dst[keep]
    x = rng.normal(size=(N, F)).astype(np.float32)
    y = rng.integers(0, C, N).astype(np.int32)
    return src, dst, x, y, N, C


def _part(src, dst, N, **kw):
    kw.setdefault("window", 64)
    kw.setdefault("sparse_tile", 128)
    kw.setdefault("dense_threshold", 48)
    return GraphPartition(src, dst, N, P_DEV, **kw)


def _gcn_weights(src, dst, N):
    loop = np.arange(N)
    s = np.concatenate([src, loop])
    r = np.concatenate([dst, loop])
    deg = np.bincount(r, minlength=N).astype(np.float64)
    w = (deg[s] ** -0.5 * deg[r] ** -0.5).astype(np.float32)
    return s, r, w


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_dist_gcn_forward_matches_reference():
    src, dst, x, y, N, C = _problem()
    part = _part(src, dst, N)
    model = DistGCN(hidden_channels=8, num_classes=C)
    x_sh = part.shard_nodes(x)
    params = part.init_model(model, x_sh, jax.random.PRNGKey(0))
    out = part.unshard_nodes(part.apply_model(model, params, x_sh))

    s, r, w = _gcn_weights(src, dst, N)
    p = params["params"]

    def agg(h):
        return spmm(jnp.asarray(s), jnp.asarray(r), h, N,
                    weights=jnp.asarray(w))

    h = jax.nn.relu(agg(jnp.asarray(x) @ p["conv1"]["weight"])
                    + p["conv1"]["bias"])
    ref = np.asarray(agg(h @ p["conv2"]["weight"])
                     + p["conv2"]["bias"])
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=6e-2)


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_dist_sage_forward_matches_reference():
    src, dst, x, y, N, C = _problem(seed=1)
    part = _part(src, dst, N)
    model = DistSAGE(hidden_channels=8, num_classes=C)
    x_sh = part.shard_nodes(x)
    params = part.init_model(model, x_sh, jax.random.PRNGKey(1))
    out = part.unshard_nodes(part.apply_model(model, params, x_sh))

    p = params["params"]
    deg = np.bincount(dst, minlength=N).astype(np.float32)

    def mean_agg(h):
        s = segment_sum(jnp.take(h, jnp.asarray(src), axis=0),
                        jnp.asarray(dst), N)
        return (s + h) / jnp.asarray(deg + 1.0)[:, None]

    h = jax.nn.relu(mean_agg(jnp.asarray(x)) @ p["conv1"]["weight"]
                    + p["conv1"]["bias"])
    ref = np.asarray(mean_agg(h) @ p["conv2"]["weight"]
                     + p["conv2"]["bias"])
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=6e-2)


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_dist_gat_forward_matches_reference():
    src, dst, x, y, N, C = _problem(seed=2)
    part = _part(src, dst, N)
    model = DistGAT(num_classes=C, hidden_channels=6, heads=3)
    x_sh = part.shard_nodes(x)
    params = part.init_model(model, x_sh, jax.random.PRNGKey(2))
    out = part.unshard_nodes(part.apply_model(model, params, x_sh))

    # reference: segment-softmax GAT on the self-loop-augmented edges
    loop = np.arange(N)
    s = jnp.asarray(np.concatenate([src, loop]))
    r = jnp.asarray(np.concatenate([dst, loop]))
    p = params["params"]

    def gat_layer(h_in, lp, heads, C_out, concat):
        h = h_in @ lp["weight"]                      # (N, H*C)
        hh = h.reshape(N, heads, C_out)
        a_s = jnp.sum(hh * lp["att_src"], axis=-1)   # (N, H)
        a_d = jnp.sum(hh * lp["att_dst"], axis=-1)
        z = jax.nn.leaky_relu(jnp.take(a_s, s, axis=0)
                              + jnp.take(a_d, r, axis=0), 0.2)
        zmax = jax.ops.segment_max(z, r, num_segments=N)
        ez = jnp.exp(z - jnp.take(zmax, r, axis=0))
        den = segment_sum(ez, r, N)
        msgs = jnp.take(hh, s, axis=0) * ez[..., None]
        num = segment_sum(msgs.reshape(-1, heads * C_out), r, N)
        o = num.reshape(N, heads, C_out) / den[..., None]
        o = o.reshape(N, heads * C_out) if concat else o.mean(axis=1)
        return o + lp["bias"]

    h = jax.nn.elu(gat_layer(jnp.asarray(x), p["conv1"], 3, 6, True))
    ref = np.asarray(gat_layer(h, p["conv2"], 1, C, False))
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=6e-2)


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_dist_gcn_train_step_matches_single_device():
    """One full make_train_step (SGD) == single-device masked-mean
    step: updated params match — grads psum correctly across shards."""
    src, dst, x, y, N, C = _problem(seed=3)
    part = _part(src, dst, N)
    model = DistGCN(hidden_channels=8, num_classes=C, dropout_rate=0.0)
    x_sh = part.shard_nodes(x)
    params = part.init_model(model, x_sh, jax.random.PRNGKey(3))
    tx = optax.sgd(0.1)
    opt = tx.init(params)

    mask = (np.arange(N) % 3 == 0)
    y_sh = part.shard_nodes(y)
    m_sh = part.shard_nodes(mask.astype(np.float32))

    def loss_fn(logits, y_l, m_l):
        logp = jax.nn.log_softmax(logits)
        oh = (y_l[:, None] == jnp.arange(logits.shape[-1])[None, :])
        nll = -jnp.sum(logp * oh.astype(logp.dtype), axis=1)
        return jnp.sum(nll * m_l), jnp.sum(m_l)

    step = part.make_train_step(model, tx, loss_fn)
    new_params, _, loss = step(params, opt, x_sh, y_sh, m_sh,
                               jax.random.PRNGKey(0))

    # single-device reference
    s, r, w = _gcn_weights(src, dst, N)

    def agg(h):
        return spmm(jnp.asarray(s), jnp.asarray(r), h, N,
                    weights=jnp.asarray(w))

    def ref_loss(p):
        pp = p["params"]
        h = jax.nn.relu(agg(jnp.asarray(x) @ pp["conv1"]["weight"])
                        + pp["conv1"]["bias"])
        logits = agg(h @ pp["conv2"]["weight"]) + pp["conv2"]["bias"]
        logp = jax.nn.log_softmax(logits)
        oh = (jnp.asarray(y)[:, None]
              == jnp.arange(C)[None, :]).astype(logp.dtype)
        nll = -jnp.sum(logp * oh, axis=1)
        m = jnp.asarray(mask.astype(np.float32))
        return jnp.sum(nll * m) / jnp.sum(m)

    lval, grads = jax.value_and_grad(ref_loss)(params)
    ref_params = optax.apply_updates(params,
                                     tx.update(grads, opt, params)[0])
    assert abs(float(loss) - float(lval)) < 3e-3
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(new_params),
            jax.tree_util.tree_leaves_with_path(ref_params)):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=3e-2, atol=2e-3,
            err_msg=str(ka))


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_dist_sage_training_converges():
    """5 distributed SAGE steps on a learnable task: loss decreases."""
    src, dst, x, y, N, C = _problem(seed=4)
    # learnable: labels correlate with features
    proto = np.random.default_rng(9).normal(size=(C, x.shape[1]))
    x = (proto[y] * 1.5 + x).astype(np.float32)
    part = _part(src, dst, N)
    model = DistSAGE(hidden_channels=16, num_classes=C)
    x_sh = part.shard_nodes(x)
    params = part.init_model(model, x_sh, jax.random.PRNGKey(5))
    tx = optax.adam(0.05)
    opt = tx.init(params)
    y_sh = part.shard_nodes(y)
    m_sh = part.shard_nodes(np.ones(N, np.float32))

    def loss_fn(logits, y_l, m_l):
        logp = jax.nn.log_softmax(logits)
        oh = (y_l[:, None] == jnp.arange(logits.shape[-1])[None, :])
        nll = -jnp.sum(logp * oh.astype(logp.dtype), axis=1)
        return jnp.sum(nll * m_l), jnp.sum(m_l)

    step = part.make_train_step(model, tx, loss_fn)
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(5):
        params, opt, loss = step(params, opt, x_sh, y_sh, m_sh, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_driver_partition_flag():
    """research driver --partition: end-to-end distributed citation
    training through the public API; loss decreases."""
    from pytorch_geometric_tpu.research.driver import (
        training_net_partitioned)

    r = training_net_partitioned("Cora", "GCN", P_DEV, epochs=8)
    assert r["loss_last"] < r["loss_first"]
    assert 0.0 <= r["test_acc"] <= 1.0


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_dist_rgcn_forward_matches_reference():
    """DistRGCN (RGCNConv + shard_ctx over per-relation halo weights)
    == single-device per-relation mean aggregation + basis combine."""
    from pytorch_geometric_tpu.parallel.models import DistRGCN

    rng = np.random.default_rng(8)
    N, E, R, F, C = 220, 1500, 4, 6, 3
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    et = rng.integers(0, R, len(src))
    x = rng.normal(size=(N, F)).astype(np.float32)
    part = GraphPartition(src, dst, N, P_DEV, window=64,
                          sparse_tile=128, dense_threshold=48,
                          edge_type=et, num_relations=R)
    model = DistRGCN(hidden_channels=5, num_classes=C,
                     num_relations=R, num_bases=2)
    x_sh = part.shard_nodes(x)
    params = part.init_model(model, x_sh, jax.random.PRNGKey(4))
    out = part.unshard_nodes(part.apply_model(model, params, x_sh))

    # single-device reference: per-relation mean + basis combine
    p = params["params"]
    fused = dst * R + et
    cnt = np.bincount(fused, minlength=N * R)
    inv = np.where(cnt > 0, 1.0 / np.maximum(cnt, 1), 0.0)
    w = inv[fused].astype(np.float32)

    def layer(h, lp, C_out):
        W = jnp.einsum("rb,bfc->rfc", lp["att"], lp["basis"])
        out = h @ lp["root"]
        for rel in range(R):
            wsel = jnp.asarray(w * (et == rel))
            out = out + segment_sum(
                jnp.take(h @ W[rel], jnp.asarray(src), axis=0)
                * wsel[:, None], jnp.asarray(dst), N)
        return out + lp["bias"]

    h = jax.nn.relu(layer(jnp.asarray(x), p["conv1"], 5))
    ref = np.asarray(layer(h, p["conv2"], C))
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=6e-2)


@pytest.mark.skipif(len(jax.devices()) < P_DEV,
                    reason="needs virtual mesh")
def test_preexisting_self_loops_are_deduped():
    """ADVICE round 4 (medium): edge lists that already carry self
    loops must get remove-then-add semantics (matching the single-chip
    convs), not a double-counted self contribution."""
    src, dst, x, y, N, C = _problem(seed=5)
    loops = np.arange(0, N, 3)
    src_l = np.concatenate([src, loops])
    dst_l = np.concatenate([dst, loops])

    model = DistGCN(hidden_channels=8, num_classes=C)
    outs = []
    for s, d in ((src, dst), (src_l, dst_l)):
        part = _part(s, d, N)
        x_sh = part.shard_nodes(x)
        params = part.init_model(model, x_sh, jax.random.PRNGKey(2))
        outs.append(part.unshard_nodes(
            part.apply_model(model, params, x_sh)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-2, atol=2e-2)


def test_partition_graph_weight_stack_routes_identically():
    """(E, K) stacked weights share one slot assignment and match the
    per-vector routing of separate calls."""
    from pytorch_geometric_tpu.parallel.partition import partition_graph

    rng = np.random.default_rng(11)
    N, E = 120, 900
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    ws = rng.normal(size=(E, 3)).astype(np.float32)
    shards, (wl_all, wr_all) = partition_graph(
        src, dst, N, 4, edge_weights=ws)
    assert wl_all.shape[0] == 3 and wr_all.shape[0] == 3
    for k in range(3):
        sh_k, (wl_k, wr_k) = partition_graph(
            src, dst, N, 4, edge_weights=ws[:, k])
        np.testing.assert_array_equal(wl_all[k], wl_k)
        np.testing.assert_array_equal(wr_all[k], wr_k)
