"""Dense differentiable pooling (Ying et al.).

Reference counterpart: ``torch_geometric.nn.dense_diff_pool`` (reference
usage: examples/enzymes_diff_pool.py:9,101).  Semantics: soft assignment
S = softmax(s); X' = S^T X; A' = S^T A S; auxiliary link-prediction loss
||A - S S^T||_F / |A| and entropy regulariser mean(H(S_i)).

Dense batched tensors (B, N, ...) — pure MXU einsums, the friendliest
possible op for TPU.
"""

import jax
import jax.numpy as jnp


def dense_diff_pool(x, adj, s, mask=None):
    """x: (B, N, F), adj: (B, N, N), s: (B, N, C) raw scores,
    mask: (B, N).  Returns (x', adj', link_loss, ent_loss)."""
    if x.ndim == 2:
        x, adj, s = x[None], adj[None], s[None]
    s = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        m = mask[..., None].astype(x.dtype)
        x = x * m
        s = s * m

    out_x = jnp.einsum("bnc,bnf->bcf", s, x)
    out_adj = jnp.einsum("bnc,bnm,bmd->bcd", s, adj, s)

    ss_t = jnp.einsum("bnc,bmc->bnm", s, s)
    link_loss = jnp.linalg.norm(adj - ss_t, axis=(-2, -1))
    denom = adj.shape[-1] * adj.shape[-2]
    link_loss = jnp.mean(link_loss) / denom

    ent = -jnp.sum(s * jnp.log(s + 1e-15), axis=-1)
    if mask is not None:
        ent_loss = jnp.sum(ent * mask.astype(x.dtype)) / \
            jnp.maximum(jnp.sum(mask), 1.0)
    else:
        ent_loss = jnp.mean(ent)
    return out_x, out_adj, link_loss, ent_loss
