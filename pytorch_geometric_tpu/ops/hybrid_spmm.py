"""Hybrid SpMM: dense window-pairs on the MXU, sparse remainder on XLA.

The windowed one-hot kernel's cost is dominated by re-fetching the
source window per (src, dst) bucket — profitable only when a bucket
carries enough edges to amortise the 512 KB window DMA + one-hot
matmuls.  Real graphs are community-structured: after locality
reordering (utils/reorder.py) most edges concentrate in a few dense
buckets while a long tail of buckets holds a handful of edges each.

``HybridSpmm`` splits edges at pack time:
- buckets with >= ``dense_threshold`` edges -> the Pallas windowed
  kernel (bf16 one-hot matmuls, fp32 accumulation);
- the remainder -> the XLA gather + sorted-segment path.

Forward = sum of both partial aggregations; the VJP composes each
part's own backward.  This is the cache-first-edge-bucketing idea of
the SpMM literature, adapted to static TPU shapes.
"""

import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.ops.spmm import SpmmOperator, spmm


class HybridSpmm:
    """out[r] = sum_e w_e x[s_e]; differentiable in (weights, x)."""

    def __init__(self, senders, receivers, num_nodes, *, window=1024,
                 tile=512, dense_threshold=None,
                 compute_dtype=jnp.bfloat16):
        senders = np.asarray(senders)
        receivers = np.asarray(receivers)
        self.num_nodes = int(num_nodes)
        thresh = dense_threshold if dense_threshold is not None \
            else tile // 2

        sw = senders // window
        dw = receivers // window
        nw = -(-num_nodes // window)
        key = dw * nw + sw
        uniq, inv, counts = np.unique(key, return_inverse=True,
                                      return_counts=True)
        dense_mask = counts[inv] >= thresh
        self.dense_frac = float(dense_mask.mean()) if len(senders) else 0.0

        self._dense_idx = np.flatnonzero(dense_mask)
        self._sparse_idx = np.flatnonzero(~dense_mask)
        self._dense_op = None
        if len(self._dense_idx):
            self._dense_op = SpmmOperator(
                senders[dense_mask], receivers[dense_mask], num_nodes,
                window=window, tile=tile, compute_dtype=compute_dtype)
        # sparse part sorted by receiver for the fast segment path
        sp_order = np.argsort(receivers[~dense_mask], kind="stable")
        self._sp_s = jnp.asarray(
            senders[~dense_mask][sp_order], jnp.int32)
        self._sp_r = jnp.asarray(
            receivers[~dense_mask][sp_order], jnp.int32)
        self._dense_sel = jnp.asarray(self._dense_idx, jnp.int32)
        self._sparse_sel = jnp.asarray(
            self._sparse_idx[sp_order], jnp.int32)

    def __call__(self, weights, x):
        out = None
        if self._dense_op is not None:
            wd = jnp.take(weights, self._dense_sel)
            out = self._dense_op(wd, x)
        if self._sparse_sel.shape[0]:
            ws = jnp.take(weights, self._sparse_sel)
            sp = spmm(self._sp_s, self._sp_r, x, self.num_nodes,
                      weights=ws, indices_are_sorted=True)
            out = sp if out is None else out + sp
        if out is None:
            out = jnp.zeros((self.num_nodes, x.shape[1]), x.dtype)
        return out
