"""Cross-framework parity: JAX convs vs plain-torch oracles.

The north star requires per-layer activations allclose vs PyTorch on
the same weights.  torch-geometric itself is not installed here, so
each oracle below implements the PyG 1.4.x math (the reference's
pinned version — reference requirement.txt:7) directly in CPU torch
with index_add_ scatter, then we load OUR parameters into it and
compare activations.  This is a genuinely independent execution path:
different framework, different scatter implementation, different
reduction order.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pytorch_geometric_tpu.data import Data, from_data  # noqa: E402


def _graph(rng, n=40, e=160, f=8):
    ei = np.unique(np.stack([rng.integers(0, n, e),
                             rng.integers(0, n, e)]), axis=1)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return from_data(Data(x=x, edge_index=ei)), x, ei


def _scatter_add(src, index, n):
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, torch.as_tensor(index, dtype=torch.long),
                          src)


def test_gcn_vs_torch_oracle(rng):
    from pytorch_geometric_tpu.nn.conv import GCNConv

    g, x, ei = _graph(rng)
    conv = GCNConv(out_channels=5)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    ours = np.asarray(conv.apply(params, g, g.x))

    # torch oracle: x' = D^-1/2 (A + I) D^-1/2 x W + b (PyG 1.4 GCNConv)
    W = torch.as_tensor(np.asarray(params["params"]["weight"]))
    b = torch.as_tensor(np.asarray(params["params"]["bias"]))
    xt = torch.as_tensor(x)
    n = x.shape[0]
    s = np.concatenate([ei[0], np.arange(n)])
    r = np.concatenate([ei[1], np.arange(n)])
    deg = _scatter_add(torch.ones(len(r)), r, n)
    dinv = deg.clamp(min=1e-12).pow(-0.5)
    wgt = dinv[s] * dinv[r]
    h = xt @ W
    msgs = h[torch.as_tensor(s, dtype=torch.long)] * wgt[:, None]
    out = _scatter_add(msgs, r, n) + b
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(ours[nm][: n], out.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_gat_vs_torch_oracle(rng):
    from pytorch_geometric_tpu.nn.conv import GATConv

    g, x, ei = _graph(rng)
    H, C = 3, 4
    conv = GATConv(out_channels=C, heads=H)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    ours = np.asarray(conv.apply(params, g, g.x))

    p = params["params"]
    W = torch.as_tensor(np.asarray(p["weight"]))
    a_s = torch.as_tensor(np.asarray(p["att_src"]))
    a_d = torch.as_tensor(np.asarray(p["att_dst"]))
    b = torch.as_tensor(np.asarray(p["bias"]))
    xt = torch.as_tensor(x)
    n = x.shape[0]
    # PyG 1.4 GATConv: remove self loops, add self loops
    keep = ei[0] != ei[1]
    s = np.concatenate([ei[0][keep], np.arange(n)])
    r = np.concatenate([ei[1][keep], np.arange(n)])
    h = (xt @ W).view(n, H, C)
    al_s = (h * a_s).sum(-1)
    al_d = (h * a_d).sum(-1)
    logits = al_s[s] + al_d[r]                       # (E', H)
    logits = torch.nn.functional.leaky_relu(logits, 0.2)
    # segment softmax per receiver
    mx = torch.full((n, H), -1e30)
    rl = torch.as_tensor(r, dtype=torch.long)
    mx = mx.index_reduce_(0, rl, logits, "amax", include_self=True)
    ex = torch.exp(logits - mx[rl])
    den = _scatter_add(ex, r, n).clamp(min=1e-16)
    alpha = ex / den[rl]
    out = _scatter_add(h[torch.as_tensor(s, dtype=torch.long)]
                       * alpha[..., None], r, n)
    out = out.reshape(n, H * C) + b
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(ours[nm][: n], out.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_gin_vs_torch_oracle(rng):
    from flax import linen as fnn

    from pytorch_geometric_tpu.nn.conv import GINConv

    g, x, ei = _graph(rng)

    class Mlp(fnn.Module):
        @fnn.compact
        def __call__(self, h, train=False):
            return fnn.Dense(6)(fnn.relu(fnn.Dense(9)(h)))

    conv = GINConv(mlp=Mlp(), eps=0.3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    ours = np.asarray(conv.apply(params, g, g.x))

    leaves = params["params"]["mlp"]
    n = x.shape[0]
    xt = torch.as_tensor(x)
    agg = _scatter_add(xt[torch.as_tensor(ei[0], dtype=torch.long)],
                       ei[1], n)
    z = (1 + 0.3) * xt + agg
    # flax auto-names by construction order: Dense_0 is the OUTER
    # Dense(6), Dense_1 the inner Dense(9)
    d_in = leaves["Dense_1"]
    d_out = leaves["Dense_0"]
    h = torch.relu(z @ torch.as_tensor(np.asarray(d_in["kernel"]))
                   + torch.as_tensor(np.asarray(d_in["bias"])))
    out = h @ torch.as_tensor(np.asarray(d_out["kernel"])) \
        + torch.as_tensor(np.asarray(d_out["bias"]))
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(ours[nm][: n], out.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_rgcn_vs_torch_oracle(rng):
    from pytorch_geometric_tpu.nn.conv import RGCNConv
    from pytorch_geometric_tpu.nn.conv.rgcn_conv import rgcn_norm

    n, e, R, B = 30, 150, 4, 2
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    et = rng.integers(0, R, e)
    x = rng.normal(size=(n, 6)).astype(np.float32)
    g = from_data(Data(x=x, edge_index=ei, edge_type=et))
    etg = g.extras["edge_type"]
    norm = rgcn_norm(g, etg, R)
    conv = RGCNConv(6, 5, R, num_bases=B)
    params = conv.init(jax.random.PRNGKey(0), g, g.x, etg, norm)
    ours = np.asarray(conv.apply(params, g, g.x, etg, norm))

    p = params["params"]
    basis = torch.as_tensor(np.asarray(p["basis"]))     # (B, F, C)
    att = torch.as_tensor(np.asarray(p["att"]))         # (R, B)
    root = torch.as_tensor(np.asarray(p["root"]))
    b = torch.as_tensor(np.asarray(p["bias"]))
    Wr = torch.einsum("rb,bfc->rfc", att, basis)
    xt = torch.as_tensor(x)
    out = xt @ root + b
    # PyG 1.4 RGCNConv aggr='mean' per relation: 1/|N_r(i)|
    for rel in range(R):
        m = et == rel
        s, r = ei[0][m], ei[1][m]
        cnt = _scatter_add(torch.ones(len(r)), r, n).clamp(min=1)
        msgs = (xt @ Wr[rel])[torch.as_tensor(s, dtype=torch.long)]
        out = out + _scatter_add(msgs, r, n) / cnt[:, None]
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(ours[nm][: n], out.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_cheb_vs_torch_oracle(rng):
    from pytorch_geometric_tpu.nn.conv import ChebConv

    g, x, ei = _graph(rng)
    K = 3
    conv = ChebConv(out_channels=5, K=K)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    ours = np.asarray(conv.apply(params, g, g.x))

    p = params["params"]
    n = x.shape[0]
    xt = torch.as_tensor(x)
    # PyG 1.4 ChebConv: L~ = L_sym - I (lambda_max = 2 assumed):
    # T_0 = x, T_1 = L~ x, T_k = 2 L~ T_{k-1} - T_{k-2}
    s, r = ei
    deg = _scatter_add(torch.ones(len(r)), r, n)
    dinv = torch.where(deg > 0, deg.clamp(min=1e-12).pow(-0.5),
                       torch.zeros(()))
    wgt = -dinv[s] * dinv[r]     # off-diagonal of L~ (diag cancels)

    def lap(v):
        msgs = v[torch.as_tensor(s, dtype=torch.long)] * wgt[:, None]
        return _scatter_add(msgs, r, n)

    Ts = [xt, lap(xt)]
    for _ in range(2, K):
        Ts.append(2 * lap(Ts[-1]) - Ts[-2])
    Wk = torch.as_tensor(np.asarray(p["weight"]))     # (K, F, C)
    out = torch.as_tensor(0.0)
    for k in range(K):
        out = out + Ts[k] @ Wk[k]
    out = out + torch.as_tensor(np.asarray(p["bias"]))
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(ours[nm][: n], out.numpy(), rtol=2e-4,
                               atol=2e-5)
