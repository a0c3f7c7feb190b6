"""GAT fused softmax-denominator path vs explicit segment_softmax."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.data import Data, from_data
from pytorch_geometric_tpu.nn.conv import GATConv, gat_dense_adj
from pytorch_geometric_tpu.ops.segment import segment_softmax, segment_sum


def test_gat_dense_matches_sparse(rng):
    """Dense (H, N, N) attention path == sparse segment path.

    Edges are deduplicated because the dense adjacency can only hold one
    edge per (i, j) pair; duplicate edges in the sparse path would each
    get their own softmax slot (PyG semantics for multigraphs).
    """
    n, f = 40, 6
    ei = np.unique(np.stack([rng.integers(0, n, 150),
                             rng.integers(0, n, 150)]), axis=1)
    g = from_data(Data(x=rng.normal(size=(n, f)).astype(np.float32),
                       edge_index=ei))
    for heads, concat in ((4, True), (3, False)):
        conv = GATConv(out_channels=5, heads=heads, concat=concat)
        params = conv.init(jax.random.PRNGKey(0), g, g.x)
        sparse = np.asarray(conv.apply(params, g, g.x))
        dense = np.asarray(conv.apply(params, g, g.x,
                                      adj=gat_dense_adj(g)))
        nm = np.asarray(g.node_mask)
        # bf16 aggregation matmul on the dense path
        np.testing.assert_allclose(dense[nm], sparse[nm], rtol=2e-2,
                                   atol=2e-2)


def test_gat_fused_matches_explicit_softmax(rng):
    n, e, f = 30, 90, 6
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = from_data(Data(x=rng.normal(size=(n, f)).astype(np.float32),
                       edge_index=ei))
    conv = GATConv(out_channels=5, heads=3)
    params = conv.init(jax.random.PRNGKey(0), g, g.x)
    out = np.asarray(conv.apply(params, g, g.x))  # fused (eval) path

    # manual: explicit two-pass segment softmax
    p = params["params"]
    N = g.num_nodes
    h = (np.asarray(g.x) @ np.asarray(p["weight"])).reshape(N, 3, 5)
    a_src = (h * np.asarray(p["att_src"])).sum(-1)
    a_dst = (h * np.asarray(p["att_dst"])).sum(-1)
    loop = np.arange(N)
    s = np.concatenate([np.asarray(g.senders), loop])
    r = np.concatenate([np.asarray(g.receivers), loop])
    logits = a_src[s] + a_dst[r]
    logits = np.where(logits > 0, logits, 0.2 * logits)
    # PyG remove_self_loops-then-add_self_loops semantics: original self
    # edges are masked out so each node keeps exactly one self slot
    dup = (s == r)
    dup[len(np.asarray(g.senders)):] = False
    logits = np.where(dup[:, None], -1e9, logits)
    alpha = np.asarray(segment_softmax(jnp.asarray(logits),
                                       jnp.asarray(r), N))
    agg = np.asarray(segment_sum(
        jnp.asarray(h[s] * alpha[..., None]), jnp.asarray(r), N))
    want = agg.reshape(N, 15) + np.asarray(p["bias"])
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(out[nm], want[nm], rtol=1e-4, atol=1e-4)
