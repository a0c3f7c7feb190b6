"""Spline-based convolution (Fey et al., SplineCNN).

Reference counterpart: ``torch_geometric.nn.SplineConv`` backed by the
torch-spline-conv CUDA wheel (reference: requirement.txt:2; vendored
scheme at gmm_conv.py:17-148 — propagate at :131, SplineBasis /
SplineWeighting applied at :134-137; usage examples/cora.py:24-25,
examples/faust.py:35-40).  Semantics (degree-1 B-splines):

  per edge, pseudo-coordinates u in [0,1]^D select 2^D kernel-grid
  corners with linear-interpolation weights; the message is
  x_j @ (sum_s b_s W[k_s]); plus root weight and bias.

TPU redesign: instead of the CUDA per-edge basis/weighting kernels, the
basis is computed as dense (E, 2^D) weights + indices, and aggregation
uses a *fused segment id* (receiver * K + kernel_index): one segment-sum
builds the (N, K, F_in) accumulator, and the kernel contraction
collapses to a single (N, K*F_in) x (K*F_in, C) MXU matmul — the FLOPs
land on the systolic array, not on scatters.
"""

import itertools

import jax.numpy as jnp
from flax import linen as nn

from pytorch_geometric_tpu.data.graph import Graph
from pytorch_geometric_tpu.nn.inits import uniform, zeros
from pytorch_geometric_tpu.ops.segment import segment_sum
from pytorch_geometric_tpu.utils.repeat import repeat


def _bspline_blend(frac, k: int, degree: int):
    """Uniform B-spline blending function for support offset ``k``.

    Matches torch-spline-conv's basis kernels (reference
    requirement.txt:2): degree 1 = linear interpolation, degree 2/3 =
    the standard quadratic/cubic uniform B-spline pieces.
    """
    f = frac
    if degree == 1:
        return 1.0 - f if k == 0 else f
    if degree == 2:
        if k == 0:
            return 0.5 * (1.0 - f) ** 2
        if k == 1:
            return -f * f + f + 0.5
        return 0.5 * f * f
    if degree == 3:
        if k == 0:
            return (1.0 - f) ** 3 / 6.0
        if k == 1:
            return (3.0 * f ** 3 - 6.0 * f * f + 4.0) / 6.0
        if k == 2:
            return (-3.0 * f ** 3 + 3.0 * f * f + 3.0 * f + 1.0) / 6.0
        return f ** 3 / 6.0
    raise NotImplementedError(f"B-spline degree {degree} (1-3 supported)")


def spline_basis(pseudo, kernel_size, is_open_spline, degree: int = 1):
    """Uniform B-spline basis of degree 1, 2 or 3.

    pseudo: (E, D) in [0,1].  Returns (weights (E, (degree+1)^D),
    indices (E, (degree+1)^D)) with indices flattened into
    prod(kernel_size).  Open splines clip the top support index — its
    blend weight is exactly 0 at pseudo == 1, so clipping is lossless.
    """
    E, D = pseudo.shape
    m = degree
    ks = jnp.asarray(kernel_size)
    open_ = jnp.asarray(is_open_spline)

    # continuous grid position per dim (degree-m support shift)
    p = pseudo * (ks - m * open_.astype(ks.dtype))
    k0 = jnp.floor(p).astype(jnp.int32)
    frac = p - k0

    combos = list(itertools.product(range(m + 1), repeat=D))
    w_list, i_list = [], []
    # flatten multi-index with row-major strides over kernel_size
    strides = []
    acc = 1
    ks_list = [int(k) for k in kernel_size]
    for d in range(D - 1, -1, -1):
        strides.insert(0, acc)
        acc *= ks_list[d]
    strides = jnp.asarray(strides)
    for combo in combos:
        w = jnp.ones((E,), pseudo.dtype)
        idx = jnp.zeros((E,), jnp.int32)
        for d, c in enumerate(combo):
            wd = _bspline_blend(frac[:, d], c, m)
            kd = k0[:, d] + c
            kd = jnp.where(open_[d] > 0, jnp.clip(kd, 0, ks[d] - 1),
                           kd % ks[d])
            w = w * wd
            idx = idx + kd * strides[d]
        w_list.append(w)
        i_list.append(idx)
    return jnp.stack(w_list, axis=1), jnp.stack(i_list, axis=1)


class SplineConv(nn.Module):
    out_channels: int
    dim: int
    kernel_size: int  # scalar or per-dim via kernel_sizes
    is_open_spline: bool = True
    degree: int = 1
    aggr: str = "add"
    root_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, pseudo=None):
        pseudo = pseudo if pseudo is not None else graph.edge_attr
        N, F_in, C = graph.num_nodes, x.shape[-1], self.out_channels
        ks = repeat(self.kernel_size, self.dim)
        K = 1
        for k in ks:
            K *= k
        open_ = repeat(1 if self.is_open_spline else 0, self.dim)

        b, idx = spline_basis(pseudo, ks, open_, self.degree)   # (E, S)
        em = graph.real_edge_mask()
        b = jnp.where(em[:, None], b, 0.0)

        x_j = jnp.take(x, graph.senders, axis=0)                 # (E, F)
        S = b.shape[1]
        # fused (receiver, kernel-index) segment id -> (N*K, F) accumulator
        fused = (graph.receivers[:, None] * K + idx).reshape(-1)  # (E*S,)
        vals = (x_j[:, None, :] * b[:, :, None]).reshape(-1, F_in)
        A = segment_sum(vals, fused, N * K).reshape(N, K * F_in)

        weight = self.param("weight", uniform(F_in * K), (K, F_in, C))
        out = jnp.dot(A, weight.reshape(K * F_in, C),
                      preferred_element_type=jnp.float32)
        if self.aggr == "mean":
            deg = segment_sum(em.astype(x.dtype), graph.receivers, N)
            out = out / jnp.maximum(deg, 1.0)[:, None]
        elif self.aggr not in ("add", "sum"):
            raise NotImplementedError(f"aggr={self.aggr}")
        if self.root_weight:
            root = self.param("root", uniform(F_in), (F_in, C))
            out = out + jnp.dot(x, root,
                                preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param("bias", uniform(F_in), (C,))
        return out
