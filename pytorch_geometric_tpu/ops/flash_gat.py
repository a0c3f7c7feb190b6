"""Flash-attention-style fused GAT aggregation (Pallas, TPU).

Replaces the dense GAT path's materialised (H, N, N) logits/softmax
chain (reference semantics: ``torch_geometric.nn.GATConv`` of PyG 1.4.x,
used at reference examples/gat.py:22-28) with one kernel per direction
that streams row-tiles of the adjacency mask through VMEM:

    z_ij   = leaky_relu(d_i + s_j)          per head
    alpha  = row-softmax(z masked by adj)
    out_i  = sum_j dropout(alpha_ij) * h_j  (MXU matmul per row tile)

HBM traffic per layer is O(N^2) 2-byte mask elements (read once fwd,
once bwd) instead of ~10 materialised (H, N, N) fp32 passes — the XLA
dense path is bandwidth-bound on exactly those passes (PERF.md).  The
attention logits are rank-1 per head (d_i + s_j), so unlike flash
attention there is no QK^T matmul: the score tile is built on the VPU
from two vectors.

Dropout (PyG drops the *normalised* alpha) runs inside the kernel via
a counter-based integer hash of (seed, global row, col, head); the
backward kernel regenerates the identical mask from coordinates
instead of storing N^2 keep-bits.  (A stateless hash rather than the
per-core PRNG: it is position-exact across the fwd/bwd grids and
lowers in interpret mode on CPU, where pltpu.prng_seed does not.)

Static shapes: adjacency is padded to multiples of the row tile; the
operator caches one compiled kernel per (rate, slope) pair.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_NEG = -1e9


def _hash_keep_bits(seed, row0, hd, shape):
    """uint32 per (global row, col) position — a stateless xorshift-mult
    mix so forward and backward grids regenerate identical dropout bits
    from coordinates alone (no PRNG state, interpret-mode safe)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(
        row0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (rows * jnp.uint32(0x9E3779B1)
         ^ cols * jnp.uint32(0x85EBCA77)
         ^ (seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
            + jnp.uint32(hd) * jnp.uint32(0x27D4EB2F)))
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    return x ^ (x >> 15)


def _fwd_kernel(seed_ref, d_ref, st_ref, h_ref, adj_ref,
                out_ref, lse_ref, *, H, C, rate, slope, tile):
    pid = pl.program_id(0)
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    for hd in range(H):
        z = d_ref[:, hd:hd + 1] + st_ref[hd:hd + 1, :]    # (TI, Np)
        z = jnp.where(z > 0, z, slope * z)
        valid = adj_ref[:].astype(jnp.float32) > 0.0
        z = jnp.where(valid, z, _NEG)
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.where(valid, jnp.exp(z - m), 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        if rate > 0:
            bits = _hash_keep_bits(seed_ref[0, 0], pid * tile, hd,
                                   p.shape)
            p = jnp.where(bits >= jnp.uint32(thresh), p, 0.0)
        acc = jnp.dot(p.astype(jnp.bfloat16),
                      h_ref[:, hd * C:(hd + 1) * C].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        out_ref[:, hd * C:(hd + 1) * C] = (
            acc * (scale / jnp.maximum(l, 1e-20)))
        lse_ref[:, hd:hd + 1] = m + jnp.log(jnp.maximum(l, 1e-20))


def _bwd_kernel(seed_ref, d_ref, st_ref, h_ref, adj_ref, lse_ref,
                out_ref, g_ref, dd_ref, dst_ref, dh_ref,
                *, H, C, rate, slope, tile):
    pid = pl.program_id(0)
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)

    @pl.when(pid == 0)
    def _init():
        dst_ref[:] = jnp.zeros_like(dst_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    for hd in range(H):
        cols = slice(hd * C, (hd + 1) * C)
        zpre = d_ref[:, hd:hd + 1] + st_ref[hd:hd + 1, :]  # (TI, Np)
        z = jnp.where(zpre > 0, zpre, slope * zpre)
        valid = adj_ref[:].astype(jnp.float32) > 0.0
        # alpha = exp(z - lse) only where valid; padding rows have
        # lse ~ -1e9 so the exponent must be suppressed before exp.
        alpha = jnp.where(
            valid,
            jnp.exp(jnp.where(valid, z, _NEG) - lse_ref[:, hd:hd + 1]),
            0.0)
        if rate > 0:
            bits = _hash_keep_bits(seed_ref[0, 0], pid * tile, hd,
                                   alpha.shape)
            keep = bits >= jnp.uint32(thresh)
            beta = jnp.where(keep, alpha * scale, 0.0)
        else:
            keep = None
            beta = alpha
        g_h = g_ref[:, cols]                               # (TI, C)
        # dL/d beta_ij = g_i . h_j  — contract the C axis, no transpose
        dbeta = jax.lax.dot_general(
            g_h.astype(jnp.bfloat16),
            h_ref[:, cols].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (TI, Np)
        dalpha = (jnp.where(keep, dbeta * scale, 0.0)
                  if rate > 0 else dbeta)
        # softmax bwd with the flash trick: sum_j alpha*dalpha = g.out
        D = jnp.sum(g_h * out_ref[:, cols], axis=1, keepdims=True)
        dz = alpha * (dalpha - D)
        dz = jnp.where(zpre > 0, dz, slope * dz)
        dz = jnp.where(valid, dz, 0.0)
        dd_ref[:, hd:hd + 1] = jnp.sum(dz, axis=1, keepdims=True)
        dst_ref[hd:hd + 1, :] += jnp.sum(dz, axis=0, keepdims=True)
        # dh_j += sum_i beta_ij g_i — contract the TI axis
        dh_ref[:, cols] += jax.lax.dot_general(
            beta.astype(jnp.bfloat16), g_h.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Np, C)


class FlashGatOperator:
    """Bound-adjacency fused GAT attention with a custom VJP.

    Built once per graph (layers with different head counts share the
    instance — kernels specialise per (H, C, rate) and are cached):

        op = FlashGatOperator(adj_bool)
        out = op(d, s, h2d, seed, rate=0.6)   # (N, H*C) float32

    ``adj_bool[i, j]`` = edge j -> i including self loops (build with
    ``gat_dense_adj``).  ``d``/``s`` are the per-node attention halves
    (N, H); ``h2d`` is (N, H*C) float32; ``seed`` is a traced f32 scalar
    (dropout determinism between fwd and bwd comes from in-kernel
    reseeding, not stored masks).
    """

    def __init__(self, adj_bool, negative_slope: float = 0.2,
                 tile: int = 128):
        adj = np.asarray(adj_bool)
        n = adj.shape[0]
        self.n = n
        self.slope = float(negative_slope)
        self.np_ = _round_up(n, max(tile, 128))
        self.tile = tile
        pad = self.np_ - n
        # bf16 0/1 mask: Mosaic on v5e rejects int8 vector compares;
        # bf16 doubles mask bytes but the compare/select lower cleanly
        self.adj = jnp.asarray(
            np.pad(adj, ((0, pad), (0, pad))).astype(np.float32),
            dtype=jnp.bfloat16)
        self._cache = {}

    def _build(self, H: int, C: int, rate: float):
        Np, TI = self.np_, self.tile
        HC = H * C
        grid = (Np // TI,)
        kw = dict(H=H, C=C, rate=rate, slope=self.slope, tile=TI)

        fwd_call = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
                pl.BlockSpec((TI, H), lambda i: (i, 0)),          # d
                pl.BlockSpec((H, Np), lambda i: (0, 0)),          # s_t
                pl.BlockSpec((Np, HC), lambda i: (0, 0)),         # h
                pl.BlockSpec((TI, Np), lambda i: (i, 0)),         # adj
            ],
            out_specs=[
                pl.BlockSpec((TI, HC), lambda i: (i, 0)),         # out
                pl.BlockSpec((TI, H), lambda i: (i, 0)),          # lse
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Np, HC), jnp.float32),
                jax.ShapeDtypeStruct((Np, H), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        bwd_call = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
                pl.BlockSpec((TI, H), lambda i: (i, 0)),          # d
                pl.BlockSpec((H, Np), lambda i: (0, 0)),          # s_t
                pl.BlockSpec((Np, HC), lambda i: (0, 0)),         # h
                pl.BlockSpec((TI, Np), lambda i: (i, 0)),         # adj
                pl.BlockSpec((TI, H), lambda i: (i, 0)),          # lse
                pl.BlockSpec((TI, HC), lambda i: (i, 0)),         # out
                pl.BlockSpec((TI, HC), lambda i: (i, 0)),         # g
            ],
            out_specs=[
                pl.BlockSpec((TI, H), lambda i: (i, 0)),          # dd
                pl.BlockSpec((H, Np), lambda i: (0, 0)),          # ds_t
                pl.BlockSpec((Np, HC), lambda i: (0, 0)),         # dh
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Np, H), jnp.float32),
                jax.ShapeDtypeStruct((H, Np), jnp.float32),
                jax.ShapeDtypeStruct((Np, HC), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        n, Npad, adj = self.n, self.np_, self.adj

        def pad_rows(x):
            return jnp.pad(x, ((0, Npad - n), (0, 0)))

        @jax.custom_vjp
        def call(d, s, h2d, seed):
            out, _ = _fwd(d, s, h2d, seed)
            return out

        def _fwd(d, s, h2d, seed):
            seed_i = jnp.reshape(seed.astype(jnp.int32), (1, 1))
            dp, sp, hp = pad_rows(d), pad_rows(s), pad_rows(h2d)
            out, lse = fwd_call(seed_i, dp, sp.T, hp, adj)
            return out[:n], (dp, sp, hp, lse, out, seed_i)

        def _bwd(res, g):
            dp, sp, hp, lse, out, seed_i = res
            gp = jnp.pad(g, ((0, Npad - n), (0, 0)))
            dd, dst, dh = bwd_call(seed_i, dp, sp.T, hp, adj, lse,
                                   out, gp)
            return (dd[:n], dst.T[:n], dh[:n],
                    jnp.zeros((), jnp.float32))

        call.defvjp(_fwd, _bwd)
        return call

    def __call__(self, d, s, h2d, seed, rate: float = 0.0,
                 raw_out: bool = False):
        if raw_out:
            raise NotImplementedError(
                "raw_out is only supported by the packed backend "
                "(PackedFlashGat); use backend='packed' for raw_out/"
                "raw_final")
        H = d.shape[1]
        C = h2d.shape[1] // H
        key = (H, C, float(rate))
        if key not in self._cache:
            self._cache[key] = self._build(*key)
        return self._cache[key](d, s, h2d,
                                jnp.asarray(seed, jnp.float32))
