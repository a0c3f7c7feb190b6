"""PointNet++ set-abstraction convolution (Qi et al.).

Reference counterpart: ``torch_geometric.nn.PointConv`` + fps/radius
(reference usage: examples/pointnet++.py:9,23-50 — SAModule with
local_nn MLP, max aggregation, global max pool head).  Semantics:
out_i = global_nn( max_{j in N(i)} local_nn([x_j || p_j - p_i]) ).

The neighbourhood (senders/receivers) comes from host-side fps/radius
(``pytorch_geometric_tpu.cluster``); the conv itself is pure device code.
Bipartite mode: pos is (pos_src, pos_dst) and receivers index the dst
set, matching the reference's ``conv(x, (pos, pos[idx]), edge_index)``.
"""

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.ops.segment import segment_max


class PointConv(nn.Module):
    local_nn: Optional[Callable] = None
    global_nn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, pos, senders, receivers, num_dst: int,
                 edge_mask=None):
        """x: (N_src, F) or None; pos: (N_src, D) or (pos_src, pos_dst)."""
        if isinstance(pos, tuple):
            pos_src, pos_dst = pos
        else:
            pos_src = pos_dst = pos
        rel = jnp.take(pos_src, senders, axis=0) - \
            jnp.take(pos_dst, receivers, axis=0)
        if x is not None:
            msg = jnp.concatenate(
                [jnp.take(x, senders, axis=0), rel], axis=-1)
        else:
            msg = rel
        if self.local_nn is not None:
            msg = self.local_nn(msg)
        if edge_mask is not None:
            big = jnp.asarray(jnp.finfo(msg.dtype).min, msg.dtype)
            msg = jnp.where(edge_mask[:, None], msg, big)
        out = segment_max(msg, receivers, num_dst)
        if self.global_nn is not None:
            out = self.global_nn(out)
        return out
