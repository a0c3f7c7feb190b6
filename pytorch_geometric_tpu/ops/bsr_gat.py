"""Block-sparse fused GAT attention (Pallas, TPU) — whole layer, any N.

Reference semantics: ``torch_geometric.nn.GATConv`` of PyG 1.4.x
(reference examples/gat.py:22-28); numerically equivalent to the sparse
segment-softmax path in nn/conv/gat_conv.py.

Design (the round-2 "fused whole-layer GAT" — VERDICT.md item 1):

- The adjacency is stored once as a padded (Np, Np) 0/1 mask, but the
  kernels stream ONLY the active (TI x TJ) blocks: a host-side pass
  lists blocks containing at least one edge (plus every diagonal block
  so each row/column strip is visited), and `PrefetchScalarGridSpec`
  drives the BlockSpec index maps from that list.  After RCM reordering
  (utils/reorder.py) real graphs keep a fraction of blocks active
  (PubMed 875/2304 at 512x512), so HBM mask traffic and exp() count
  scale with active blocks, not N^2 — this removes flash_gat.py's
  N<=8192 cap *and* its dense compute bill.
- Forward: one kernel, online softmax over each row-strip's active
  blocks (running max/denominator in VMEM scratch; out + lse written
  when the strip's last block retires).
- Backward: two kernels over the same block list in different orders —
  row-major recomputes alpha from the stored lse and accumulates
  d(logits)/d(dst-half); column-major accumulates the src-half and dh.
  Recomputation costs extra MXU flops but keeps memory at O(N): the
  flash-attention trade.
- Attention dropout (PyG drops normalised alpha) regenerates keep bits
  in every kernel from a stateless coordinate hash — exact across the
  three grid orders, zero stored state.
- The mask is stored PACKED — only the active blocks, stacked into a
  (K*TI, TJ) int8 array.  Dense (Np, Np) storage is never materialised
  (PubMed would be 1.2 GB, which also breaks remote compilation when a
  closed-over array is embedded into the serialized MLIR); int8 halves
  the per-pass mask traffic vs bf16 on top.

Masks combine arithmetically (0/1 multiplies after an astype), not via
vector compares, so int8 mask storage lowers on Mosaic.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_NEG = -1e9


def _keep_bits(seed, brow, bcol, hd, shape, ti, tj):
    """Dropout keep-bits for the global (brow*TI, bcol*TJ) block — a
    stateless xorshift-mult coordinate hash, identical across the fwd /
    bwd-row / bwd-col grids and interpret-mode safe."""
    rows = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            + brow.astype(jnp.uint32) * jnp.uint32(ti))
    cols = (jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            + bcol.astype(jnp.uint32) * jnp.uint32(tj))
    x = (rows * jnp.uint32(0x9E3779B1)
         ^ cols * jnp.uint32(0x85EBCA77)
         ^ (seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
            + jnp.uint32(hd) * jnp.uint32(0x27D4EB2F)))
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    return x ^ (x >> 15)


def _masked_logits(d_col, st_row, m01, slope):
    """leaky_relu(d_i + s_j) where valid, -1e9 where not (arithmetic
    masking — no compares against the mask dtype)."""
    z = d_col + st_row
    z = jnp.where(z > 0, z, slope * z)
    return z * m01 + (m01 - 1.0) * (-_NEG)


def _fwd_kernel(blk_ref, flg_ref, seed_ref, d_ref, st_ref, h_ref,
                adj_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, H, C, rate, slope, ti, tj):
    k = pl.program_id(0)
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)

    @pl.when(flg_ref[0, k] == 1)          # first block of this row strip
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    m01 = adj_ref[:].astype(jnp.float32)          # (TI, TJ) 0/1
    h_bf = h_ref[:].astype(jnp.bfloat16)
    for hd in range(H):
        z = _masked_logits(d_ref[:, hd:hd + 1], st_ref[hd:hd + 1, :],
                           m01, slope)
        m_old = m_ref[:, hd:hd + 1]
        m_new = jnp.maximum(m_old, jnp.max(z, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(z - m_new) * m01
        l_ref[:, hd:hd + 1] = (l_ref[:, hd:hd + 1] * corr
                               + jnp.sum(p, axis=1, keepdims=True))
        if rate > 0:
            bits = _keep_bits(seed_ref[0], blk_ref[0, k], blk_ref[1, k],
                              hd, p.shape, ti, tj)
            p = jnp.where(bits >= jnp.uint32(thresh), p, 0.0)
        cols = slice(hd * C, (hd + 1) * C)
        acc_ref[:, cols] = (
            acc_ref[:, cols] * corr
            + jnp.dot(p.astype(jnp.bfloat16), h_bf[:, cols],
                      preferred_element_type=jnp.float32))
        m_ref[:, hd:hd + 1] = m_new

    @pl.when(flg_ref[1, k] == 1)          # last block of this row strip
    def _emit():
        l = jnp.maximum(l_ref[:], 1e-20)
        for hd in range(H):        # Mosaic rejects repeat's shape cast
            cols = slice(hd * C, (hd + 1) * C)
            out_ref[:, cols] = acc_ref[:, cols] * (scale
                                                   / l[:, hd:hd + 1])
        lse_ref[:] = m_ref[:] + jnp.log(l)


def _bwd_row_kernel(blk_ref, flg_ref, seed_ref, d_ref, st_ref, h_ref,
                    adj_ref, lse_ref, dterm_ref, g_ref, dd_ref, accd_ref,
                    *, H, C, rate, slope, ti, tj):
    k = pl.program_id(0)
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)

    @pl.when(flg_ref[0, k] == 1)
    def _init():
        accd_ref[:] = jnp.zeros_like(accd_ref)

    m01 = adj_ref[:].astype(jnp.float32)
    h_bf = h_ref[:].astype(jnp.bfloat16)
    for hd in range(H):
        cols = slice(hd * C, (hd + 1) * C)
        zpre = d_ref[:, hd:hd + 1] + st_ref[hd:hd + 1, :]
        z = jnp.where(zpre > 0, zpre, slope * zpre)
        z = z * m01 + (m01 - 1.0) * (-_NEG)
        # clamp: padding rows carry garbage lse; exp(<=0) stays finite
        alpha = jnp.exp(jnp.minimum(z - lse_ref[:, hd:hd + 1], 0.0)) * m01
        g_h = g_ref[:, cols]
        dbeta = jax.lax.dot_general(
            g_h.astype(jnp.bfloat16), h_bf[:, cols],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (TI, TJ)
        if rate > 0:
            bits = _keep_bits(seed_ref[0], blk_ref[0, k], blk_ref[1, k],
                              hd, dbeta.shape, ti, tj)
            dalpha = jnp.where(bits >= jnp.uint32(thresh),
                               dbeta * scale, 0.0)
        else:
            dalpha = dbeta
        dz = alpha * (dalpha - dterm_ref[:, hd:hd + 1])
        dz = jnp.where(zpre > 0, dz, slope * dz) * m01
        accd_ref[:, hd:hd + 1] += jnp.sum(dz, axis=1, keepdims=True)

    @pl.when(flg_ref[1, k] == 1)
    def _emit():
        dd_ref[:] = accd_ref[:]


def _bwd_col_kernel(blk_ref, flg_ref, seed_ref, d_ref, st_ref, h_ref,
                    adj_ref, lse_ref, dterm_ref, g_ref,
                    ds_ref, dh_ref, accs_ref, acch_ref,
                    *, H, C, rate, slope, ti, tj):
    k = pl.program_id(0)
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)

    @pl.when(flg_ref[0, k] == 1)          # first block of this column
    def _init():
        accs_ref[:] = jnp.zeros_like(accs_ref)
        acch_ref[:] = jnp.zeros_like(acch_ref)

    m01 = adj_ref[:].astype(jnp.float32)
    h_bf = h_ref[:].astype(jnp.bfloat16)
    for hd in range(H):
        cols = slice(hd * C, (hd + 1) * C)
        zpre = d_ref[:, hd:hd + 1] + st_ref[hd:hd + 1, :]
        z = jnp.where(zpre > 0, zpre, slope * zpre)
        z = z * m01 + (m01 - 1.0) * (-_NEG)
        alpha = jnp.exp(jnp.minimum(z - lse_ref[:, hd:hd + 1], 0.0)) * m01
        g_h = g_ref[:, cols]
        dbeta = jax.lax.dot_general(
            g_h.astype(jnp.bfloat16), h_bf[:, cols],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (TI, TJ)
        if rate > 0:
            bits = _keep_bits(seed_ref[0], blk_ref[0, k], blk_ref[1, k],
                              hd, dbeta.shape, ti, tj)
            keep = bits >= jnp.uint32(thresh)
            dalpha = jnp.where(keep, dbeta * scale, 0.0)
            beta = jnp.where(keep, alpha * scale, 0.0)
        else:
            dalpha = dbeta
            beta = alpha
        dz = alpha * (dalpha - dterm_ref[:, hd:hd + 1])
        dz = jnp.where(zpre > 0, dz, slope * dz) * m01
        # (H, TJ) row-major accumulator: axis-0 sum keeps the lane dim
        accs_ref[hd:hd + 1, :] += jnp.sum(dz, axis=0, keepdims=True)
        # dh_j += sum_i beta_ij g_i  (contract the row axis)
        acch_ref[:, cols] += jax.lax.dot_general(
            beta.astype(jnp.bfloat16), g_h.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (TJ, C)

    @pl.when(flg_ref[1, k] == 1)          # last block of this column
    def _emit():
        ds_ref[:] = accs_ref[:]
        dh_ref[:] = acch_ref[:]


class BsrFlashGat:
    """Whole-layer fused GAT attention over the active-block list.

    Same call contract as ops/flash_gat.FlashGatOperator:

        op = BsrFlashGat(adj_bool)            # bool (N, N), edge j->i
        out = op(d, s, h2d, seed, rate=0.6)   # (N, H*C) float32

    ``d``/``s`` are the per-node attention halves (N, H) (dst/src);
    ``h2d`` is (N, H*C).  Scales to any N: VMEM holds only (TI, TJ) and
    (TJ, H*C) blocks; wall-clock scales with active blocks.  Reorder
    the graph first (utils/reorder.py RCM) to concentrate edges into
    few blocks.
    """

    def __init__(self, adj_bool, negative_slope: float = 0.2,
                 tile_i: int = 512, tile_j: int = 512,
                 mask_dtype=jnp.int8, interpret: bool = None):
        adj = np.asarray(adj_bool)
        n = adj.shape[0]
        self.n = n
        self.slope = float(negative_slope)
        self.ti, self.tj = ti, tj = tile_i, tile_j
        self.np_ = _round_up(n, int(np.lcm(ti, tj)))
        nbr, nbc = self.np_ // ti, self.np_ // tj
        pad = self.np_ - n
        adj_p = np.pad(adj, ((0, pad), (0, pad)))

        # active block map; diagonal strip always active so every row
        # strip and column strip is visited and its outputs written
        blkmap = adj_p.reshape(nbr, ti, nbc, tj).any(axis=(1, 3))
        for i in range(nbr):
            blkmap[i, min(i * ti // tj, nbc - 1)] = True
        for j in range(nbc):
            blkmap[min(j * tj // ti, nbr - 1), j] = True
        brow, bcol = np.nonzero(blkmap)            # row-major order
        self.num_blocks = K = len(brow)
        self.density = K / (nbr * nbc)

        # packed mask: active blocks only, stacked along rows
        packed = np.empty((K * ti, tj), dtype=np.int8)
        for k in range(K):
            packed[k * ti:(k + 1) * ti] = adj_p[
                brow[k] * ti:(brow[k] + 1) * ti,
                bcol[k] * tj:(bcol[k] + 1) * tj]
        np_dtype = np.dtype(mask_dtype)
        self.adj = jnp.asarray(packed.astype(np_dtype), dtype=mask_dtype)

        def flags(keys):
            first = np.ones(K, np.int32)
            first[1:] = keys[1:] != keys[:-1]
            last = np.ones(K, np.int32)
            last[:-1] = keys[1:] != keys[:-1]
            return np.stack([first, last])

        # blk rows: [block row strip, block col strip, packed index]
        self._blk_r = jnp.asarray(np.stack(
            [brow, bcol, np.arange(K)]).astype(np.int32))
        self._flg_r = jnp.asarray(flags(brow))
        order = np.lexsort((brow, bcol))           # column-major order
        self._blk_c = jnp.asarray(np.stack(
            [brow[order], bcol[order], order]).astype(np.int32))
        self._flg_c = jnp.asarray(flags(bcol[order]))
        self._interpret = (jax.default_backend() != "tpu"
                           if interpret is None else interpret)
        self._cache = {}

    def _build(self, H: int, C: int, rate: float):
        ti, tj, Np, K = self.ti, self.tj, self.np_, self.num_blocks
        HC = H * C
        kw = dict(H=H, C=C, rate=rate, slope=self.slope, ti=ti, tj=tj)
        cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

        def gs(in_specs, out_specs, scratch):
            return pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3, grid=(K,), in_specs=in_specs,
                out_specs=out_specs, scratch_shapes=scratch)

        d_spec = pl.BlockSpec((ti, H), lambda k, blk, flg, s: (blk[0, k], 0))
        st_spec = pl.BlockSpec((H, tj),
                               lambda k, blk, flg, s: (0, blk[1, k]))
        # packed mask: block k of the (K*TI, TJ) stack via blk[2, k]
        adj_spec = pl.BlockSpec(
            (ti, tj), lambda k, blk, flg, s: (blk[2, k], 0))
        row_spec = lambda w: pl.BlockSpec(     # noqa: E731
            (ti, w), lambda k, blk, flg, s: (blk[0, k], 0))
        col_spec = lambda w: pl.BlockSpec(     # noqa: E731
            (tj, w), lambda k, blk, flg, s: (blk[1, k], 0))

        fwd_call = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid_spec=gs(
                [d_spec, st_spec, col_spec(HC), adj_spec],
                [row_spec(HC), row_spec(H)],
                [pltpu.VMEM((ti, HC), jnp.float32),
                 pltpu.VMEM((ti, H), jnp.float32),
                 pltpu.VMEM((ti, H), jnp.float32)]),
            out_shape=[jax.ShapeDtypeStruct((Np, HC), jnp.float32),
                       jax.ShapeDtypeStruct((Np, H), jnp.float32)],
            interpret=self._interpret, compiler_params=cp)

        bwd_row_call = pl.pallas_call(
            functools.partial(_bwd_row_kernel, **kw),
            grid_spec=gs(
                [d_spec, st_spec, col_spec(HC), adj_spec, row_spec(H),
                 row_spec(H), row_spec(HC)],
                [row_spec(H)],
                [pltpu.VMEM((ti, H), jnp.float32)]),
            out_shape=[jax.ShapeDtypeStruct((Np, H), jnp.float32)],
            interpret=self._interpret, compiler_params=cp)

        dst_spec = pl.BlockSpec((H, tj),
                                lambda k, blk, flg, s: (0, blk[1, k]))
        bwd_col_call = pl.pallas_call(
            functools.partial(_bwd_col_kernel, **kw),
            grid_spec=gs(
                [d_spec, st_spec, col_spec(HC), adj_spec, row_spec(H),
                 row_spec(H), row_spec(HC)],
                [dst_spec, col_spec(HC)],
                [pltpu.VMEM((H, tj), jnp.float32),
                 pltpu.VMEM((tj, HC), jnp.float32)]),
            out_shape=[jax.ShapeDtypeStruct((H, Np), jnp.float32),
                       jax.ShapeDtypeStruct((Np, HC), jnp.float32)],
            interpret=self._interpret, compiler_params=cp)

        n, Npad = self.n, self.np_
        blk_r, flg_r = self._blk_r, self._flg_r
        blk_c, flg_c = self._blk_c, self._flg_c

        def pad_rows(x):
            return jnp.pad(x, ((0, Npad - x.shape[0]), (0, 0)))

        # `adj` is an ARGUMENT (not a closure constant): closed-over
        # arrays get inlined into the serialized MLIR and blow up
        # remote compilation at PubMed scale.  Its cotangent is an
        # unused zeros expression that XLA dead-code-eliminates.
        @jax.custom_vjp
        def call(adj, d, s, h2d, seed):
            out, _ = _fwd(adj, d, s, h2d, seed)
            return out

        def _fwd(adj, d, s, h2d, seed):
            seed_i = jnp.reshape(seed.astype(jnp.int32), (1,))
            dp, sp, hp = pad_rows(d), pad_rows(s), pad_rows(h2d)
            out, lse = fwd_call(blk_r, flg_r, seed_i, dp, sp.T, hp, adj)
            return out[:n], (adj, dp, sp, hp, lse, out, seed_i)

        def _bwd(res, g):
            adj, dp, sp, hp, lse, out, seed_i = res
            gp = jnp.pad(g, ((0, Npad - n), (0, 0)))
            # flash softmax-bwd row term: D_i = sum_c g_ic out_ic per head
            dterm = jnp.sum((gp * out).reshape(Npad, H, C), axis=-1)
            (dd,) = bwd_row_call(blk_r, flg_r, seed_i, dp, sp.T, hp, adj,
                                 lse, dterm, gp)
            dst, dh = bwd_col_call(blk_c, flg_c, seed_i, dp, sp.T, hp,
                                   adj, lse, dterm, gp)
            return (jnp.zeros_like(adj), dd[:n], dst.T[:n], dh[:n],
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
        return self._cache[key](self.adj, d, s, h2d,
                                jnp.asarray(seed, jnp.float32))
