"""Reddit-scale single-chip benchmarks (VERDICT round 2, items 1+9).

Every round-2 number was an overhead-bound toy graph (<= 20k nodes);
these rows prove the bandwidth-bound regime the kernel layer was
designed for, on a Reddit-shaped synthetic graph with canonical shapes
(232,965 nodes / ~114.6M directed edges / 602 features / 41 classes —
reference Reddit usage: ConvexPruning.py:504-507; canonical shapes per
datasets/synthetic.py convention).

Rows emitted (all measured in-program on the real chip):

- ``reddit_gcn_fullgraph_epoch``   full-batch 2-layer GCN train epoch
- ``reddit_sage_fullgraph_epoch``  full-batch 2-layer GraphSAGE epoch
- ``reddit_spmm_ns_per_edge``      the 128-wide aggregation itself
- ``random_row_copy_ceiling``      measured random-row-access ceiling
- ``spmm_vs_random_access_roofline`` the north-star fraction
  (BASELINE.md: SpMM >= 80% of roofline).  The BSR dense-block path
  can EXCEED 1.0: dense (window, window) blocks aggregate ~40%-dense
  communities as batched MXU matmuls, reading each source window once
  instead of once per edge — that is the point of the design.
- ``halo_gcn_edges_per_s_1dev``    hardware anchor for the virtual-mesh
  scaling curve (bench_suite --scaling).

The graph loads once; all rows share it.  Big tables ride through jit
as ARGUMENTS (ops/spmm.py bind_external) — never closure constants.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench_common import emit as _emit, time_program


def emit(*args, **kwargs):
    # every row in this suite runs on a generated (Reddit-shaped or
    # adversarial) graph — mark provenance explicitly (VERDICT item 7)
    kwargs.setdefault("synthetic", True)
    return _emit(*args, **kwargs)

REDDIT_N = 232_965
REDDIT_E = 114_615_892
REDDIT_F = 602
REDDIT_C = 41


def gen_clustered(n, e, communities, seed=0):
    """Community-structured synthetic graph, locality-ordered (the
    standard generator of bench_suite.py, shared across rounds)."""
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, communities, n)
    pos_of = np.empty(n, dtype=np.int64)
    pos_of[np.argsort(comm, kind="stable")] = np.arange(n)
    starts = np.searchsorted(np.sort(comm), np.arange(communities))
    counts = np.bincount(comm, minlength=communities)
    src = rng.integers(0, n, e)
    intra = rng.random(e) < 0.9
    c = comm[src]
    dst = np.where(intra,
                   starts[c] + (rng.random(e) * counts[c]).astype(
                       np.int64),
                   rng.integers(0, n, e))
    return pos_of[src], dst, comm[np.argsort(pos_of, kind="stable")]


class RedditBench:
    """Shared state: graph, features, labels, bound SpMM operators."""

    def __init__(self, n=REDDIT_N, e=REDDIT_E, f=REDDIT_F, c=REDDIT_C,
                 communities=200, window=1024, dense_threshold=1024,
                 sparse_tile=256, seed=0):
        from pytorch_geometric_tpu.ops.block_spmm import (
            BlockSpmm, BlockStructure)

        self.n, self.e, self.f, self.c = n, e, f, c
        t0 = time.perf_counter()
        senders, receivers, comm_of = gen_clustered(n, e, communities,
                                                    seed)
        self.gen_s = time.perf_counter() - t0

        deg = np.bincount(receivers, minlength=n).astype(np.float64) + 1
        dis = deg ** -0.5
        w_gcn = (dis[senders] * dis[receivers]).astype(np.float32)
        w_mean = (1.0 / deg[receivers]).astype(np.float32)

        t0 = time.perf_counter()
        # one graph pass shared by both weightings (BlockStructure)
        structure = BlockStructure(senders, receivers, n,
                                   window=window,
                                   dense_threshold=dense_threshold,
                                   sparse_tile=sparse_tile)
        self.op_gcn = BlockSpmm(senders, receivers, n, w_gcn,
                                structure=structure)
        self.fn_gcn, self.consts_gcn = self.op_gcn.bind()
        self.consts_gcn = jax.tree_util.tree_map(
            jax.device_put, self.consts_gcn)
        jax.block_until_ready(self.consts_gcn)

        # the mean-aggregation blocks differ from the GCN blocks by a
        # separable per-endpoint factor (w_mean/w_gcn = deg_s^.5 *
        # deg_r^-.5, which commutes with duplicate-edge summing), so
        # they are derived ON DEVICE from the GCN blocks — no second
        # multi-GB host build or transfer
        self.fn_mean = self.fn_gcn
        consts_mean = dict(self.consts_gcn)
        if structure.num_dense_blocks:
            nw, W = structure.num_windows, structure.window
            deg_pad = np.ones(nw * W, np.float32)
            deg_pad[:n] = deg.astype(np.float32)
            degw = jnp.asarray(deg_pad.reshape(nw, W))

            @jax.jit
            def derive(blocks, degw, bsw, bdw):
                col = jnp.sqrt(degw)[bsw][:, None, :]
                row = jax.lax.rsqrt(degw)[bdw][:, :, None]
                return (blocks.astype(jnp.float32) * col
                        * row).astype(blocks.dtype)

            consts_mean["blocks"] = derive(
                self.consts_gcn["blocks"], degw,
                self.consts_gcn["bsw"], self.consts_gcn["bdw"])
        if structure.sparse is not None:
            _, sp_consts = structure.sparse.bind_external(
                w_mean[structure._sparse_edge_ids])
            consts_mean["sparse"] = jax.tree_util.tree_map(
                jax.device_put, sp_consts)
        self.consts_mean = consts_mean
        jax.block_until_ready(self.consts_mean)
        self.op_mean = self.op_gcn
        self.pack_s = time.perf_counter() - t0

        # learnable synthetic task: labels follow the community (41
        # classes over `communities` groups), features = noisy one-hot
        # community signal in a random 602-d rotation
        rng = np.random.default_rng(seed + 1)
        y = (comm_of % c).astype(np.int32)
        proto = rng.normal(size=(communities, f)).astype(np.float32)
        x = (proto[comm_of] * 0.5
             + rng.normal(size=(n, f)).astype(np.float32))
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.train_mask = jnp.asarray(
            rng.random(n).astype(np.float32) < 0.66)
        self.dense_edge_frac = self.op_gcn.dense_edge_frac
        self.sparse_inflation = self.op_gcn.flop_inflation
        self.n_blocks = self.op_gcn.num_dense_blocks


def _train_epoch_fn(bench, layer):
    """Build (loss_fn, tx, params0, opt0, consts, labels) for
    'gcn'|'sage'.  EVERYTHING big (consts, x, y, mask) must flow in as
    traced jit arguments — closing over the concrete arrays embeds GBs
    of constants into the program (remote compile rejects it)."""

    n, f, c = bench.n, bench.f, bench.c
    hidden = 128
    rng = np.random.default_rng(0)
    tx = optax.adam(1e-2)

    if layer == "gcn":
        fn, consts = bench.fn_gcn, bench.consts_gcn
        params = {
            "w1": jnp.asarray(rng.normal(size=(f, hidden))
                              .astype(np.float32) * 0.05),
            "w2": jnp.asarray(rng.normal(size=(hidden, c))
                              .astype(np.float32) * 0.05),
        }

        def forward(p, consts, x):
            h = jax.nn.relu(fn(consts, x @ p["w1"]))
            return fn(consts, h @ p["w2"])
    else:  # sage: h = relu(x Ws + mean_agg(x) Wn)
        fn, consts = bench.fn_mean, bench.consts_mean
        params = {
            "ws1": jnp.asarray(rng.normal(size=(f, hidden))
                               .astype(np.float32) * 0.05),
            "wn1": jnp.asarray(rng.normal(size=(f, hidden))
                               .astype(np.float32) * 0.05),
            "ws2": jnp.asarray(rng.normal(size=(hidden, c))
                               .astype(np.float32) * 0.05),
            "wn2": jnp.asarray(rng.normal(size=(hidden, c))
                               .astype(np.float32) * 0.05),
        }

        def forward(p, consts, x):
            h = jax.nn.relu(x @ p["ws1"] + fn(consts, x) @ p["wn1"])
            return h @ p["ws2"] + fn(consts, h) @ p["wn2"]

    def loss_fn(p, consts, x, y, mask):
        logits = forward(p, consts, x)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        return jnp.sum(nll * mask) / jnp.sum(mask)

    opt0 = tx.init(params)
    return loss_fn, tx, params, opt0, consts


def bench_reddit_layer(bench, layer, epochs=3):
    loss_fn, tx, params0, opt0, consts = _train_epoch_fn(bench, layer)
    mask = bench.train_mask.astype(jnp.float32)

    @jax.jit
    def run(params, opt, consts, x, y, mask):
        def epoch(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, consts, x, y,
                                                      mask)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(epoch, (params, opt), None,
                                      length=epochs)
        return losses[-1], losses

    secs, (last, losses) = time_program(run, params0, opt0, consts,
                                        bench.x, bench.y, mask, iters=2)
    per = secs / epochs
    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), f"{layer} loss diverged: {losses}"
    assert losses[-1] < losses[0], \
        f"{layer} loss did not decrease: {losses}"
    return emit(
        f"reddit_{layer}_fullgraph_epoch", per, None,
        {"n": bench.n, "e": bench.e, "f": bench.f,
         "Gedge_per_s": round(bench.e / per / 1e9, 3),
         "epochs_timed": epochs,
         "loss_first": round(float(losses[0]), 4),
         "loss_last": round(float(losses[-1]), 4),
         "dense_edge_frac": round(bench.dense_edge_frac, 3),
         "dense_blocks": bench.n_blocks,
         "kernel": "block_spmm (BSR dense + packed sparse)"})


def bench_reddit_spmm(bench, f=128, K=5):
    """The aggregation itself at hidden width, plus the in-program
    random-row-access ceiling and the north-star roofline fraction."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(bench.n, f)).astype(np.float32))
    fn, consts = bench.fn_gcn, bench.consts_gcn

    @jax.jit
    def run(consts, x):
        def step(acc, i):
            return acc + jnp.sum(fn(consts, x * (1.0 + 1e-9 * i))), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return out

    secs, _ = time_program(run, consts, x, iters=2)
    t_spmm = secs / K
    edges_per_s = bench.e / t_spmm
    rec1 = {"metric": "reddit_spmm_ns_per_edge",
            "value": round(t_spmm / bench.e * 1e9, 4), "unit": "ns",
            "vs_baseline": None,
            "detail": {"f": f, "ms": round(t_spmm * 1e3, 2),
                       "Gedge_per_s": round(edges_per_s / 1e9, 3)}}
    print(json.dumps(rec1), flush=True)

    # ceiling: pure random-row gather (no compute), same row width,
    # measured on THIS chip in THIS program shape
    e_probe = 8_000_000
    perm = jnp.asarray(
        np.random.default_rng(3).integers(0, bench.n, e_probe),
        jnp.int32)

    @jax.jit
    def gather(idx, x):
        def step(acc, i):
            return acc + jnp.sum(jnp.take(x, (idx + i) % bench.n,
                                          axis=0)), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return out

    secs, _ = time_program(gather, perm, x, iters=2)
    t_row = secs / K / e_probe
    rows_per_s = 1.0 / t_row
    rec2 = {"metric": "random_row_copy_ceiling",
            "value": round(t_row * 1e9, 4), "unit": "ns",
            "vs_baseline": None,
            "detail": {"f": f,
                       "Grow_per_s": round(rows_per_s / 1e9, 3)}}
    print(json.dumps(rec2), flush=True)
    frac = edges_per_s / rows_per_s
    rec3 = {"metric": "spmm_vs_random_access_roofline",
            "value": round(frac, 4), "unit": "fraction",
            "vs_baseline": None,
            "detail": {
                "target": ">= 0.8 (north star, BASELINE.md)",
                "note": "fraction > 1 means the BSR dense-block path "
                "beats per-edge random access outright: dense community "
                "blocks are aggregated as batched MXU matmuls that read "
                "each source window once, not once per edge"}}
    print(json.dumps(rec3), flush=True)
    return [rec1, rec2, rec3]


V5E_HBM_PEAK = 819e9  # bytes/s (v5e spec)


def bench_spmm_hbm_fraction(bench, f=128, K=5):
    """The literal north-star metric (BASELINE.md: 'SpMM >= 80% of HBM
    roofline'): achieved bytes/s of the Reddit SpMM program divided by
    the chip's HBM peak.  Bytes = everything the program must stream
    from/to HBM at least once per call: the consts pytree (dense block
    tables + packed sparse tables + weights), x, and the output —
    a LOWER bound on true traffic (per-block re-reads of x windows and
    the segment-sum intermediate are not counted), so the fraction is
    conservative."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(bench.n, f)).astype(np.float32))
    fn, consts = bench.fn_gcn, bench.consts_gcn

    consts_bytes = sum(
        np.prod(c.shape) * c.dtype.itemsize
        for c in jax.tree_util.tree_leaves(consts))
    io_bytes = consts_bytes + x.nbytes + bench.n * f * 4

    @jax.jit
    def run(consts, x):
        def step(acc, i):
            return acc + jnp.sum(fn(consts, x * (1.0 + 1e-9 * i))), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return out

    secs, _ = time_program(run, consts, x, iters=2)
    t = secs / K
    frac = io_bytes / t / V5E_HBM_PEAK
    rec = {"metric": "spmm_hbm_fraction",
           "value": round(frac, 4), "unit": "fraction",
           "vs_baseline": None,
           "detail": {
               "target": ">= 0.8 (north star, BASELINE.md)",
               "achieved_GBps": round(io_bytes / t / 1e9, 1),
               "hbm_peak_GBps": round(V5E_HBM_PEAK / 1e9, 0),
               "consts_GB": round(consts_bytes / 1e9, 2),
               "ms": round(t * 1e3, 2), "f": f,
               "note": "bytes counted once per array (consts + x + "
               "out): a lower bound on streamed traffic.  A LOW "
               "fraction means the program is not HBM-bound: the BSR "
               "blocks read each source window once (the design "
               "goal), and the residual wall-clock is the packed "
               "sparse tail's per-tile overhead — ~52k tiles for the "
               "10%% non-dense edges dominate the program (PERF.md "
               "round 4)"}}
    print(json.dumps(rec), flush=True)
    return [rec]


def bench_adversarial_spmm(n=REDDIT_N, e=8_000_000, f=128, K=5):
    """Adversarial low-clustering row (round-3 verdict weak #1): the
    community generator flattered the BSR path (90% of edges in
    40%-dense blocks).  This graph has zipf power-law out-degrees and
    uniform receivers — no community structure to exploit; the only
    density left is the hub columns the zipf tail creates (reported
    as dense_edge_frac), which the dense/sparse splitter may
    legitimately take.  The scattered remainder rides the packed
    one-hot path at high pad inflation — the worst case a per-edge
    kernel must defend against the in-program random-row-access
    ceiling."""
    from pytorch_geometric_tpu.ops.block_spmm import BlockSpmm

    rng = np.random.default_rng(7)
    # power-law senders (Zipf-ish over a permuted id space), uniform
    # receivers: no exploitable block density in either orientation
    ranks = rng.zipf(1.5, size=e).astype(np.int64) % n
    perm = rng.permutation(n)
    senders = perm[ranks]
    receivers = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)

    t0 = time.perf_counter()
    op = BlockSpmm(senders, receivers, n, w, window=1024,
                   dense_threshold=1024, sparse_tile=None)
    fn, consts = op.bind()
    consts = jax.tree_util.tree_map(jax.device_put, consts)
    jax.block_until_ready(consts)
    pack_s = time.perf_counter() - t0
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    @jax.jit
    def run(consts, x):
        def step(acc, i):
            return acc + jnp.sum(fn(consts, x * (1.0 + 1e-9 * i))), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return out

    secs, _ = time_program(run, consts, x, iters=2)
    t = secs / K
    ns_edge = t / e * 1e9

    # in-program random-row ceiling at the same row width
    e_probe = 8_000_000
    idx = jnp.asarray(rng.integers(0, n, e_probe), jnp.int32)

    @jax.jit
    def gather(idx, x):
        def step(acc, i):
            return acc + jnp.sum(jnp.take(x, (idx + i) % n,
                                          axis=0)), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return out

    secs2, _ = time_program(gather, idx, x, iters=2)
    ns_row = secs2 / K / e_probe * 1e9
    frac = ns_row / ns_edge
    rec = {"metric": "adversarial_spmm_vs_random_access",
           "value": round(frac, 4), "unit": "fraction",
           "vs_baseline": None,
           "detail": {
               "target": ">= 0.8 of the random-access ceiling on a "
               "graph with no dense blocks",
               "ns_per_edge": round(ns_edge, 3),
               "ceiling_ns_per_row": round(ns_row, 3),
               "dense_edge_frac": round(op.dense_edge_frac, 4),
               "sparse_inflation": round(op.flop_inflation, 2),
               "e": e, "f": f, "pack_s": round(pack_s, 1),
               "graph": "zipf(1.5) senders, uniform receivers",
               "note": "fraction < 1 on this shape is the honest "
               "price of padding scattered buckets to tile "
               "granularity; the XLA per-edge gather alternative "
               "pays the ~20 ns/row ceiling PLUS a segment pass"}}
    print(json.dumps(rec), flush=True)
    return [rec]


def bench_halo_1dev():
    """The 1-device TPU anchor for the halo scaling curve (the virtual
    CPU mesh provides the relative curve; this is the absolute
    hardware point — VERDICT item 9)."""
    from bench_suite import bench_halo_scaling

    results = bench_halo_scaling()           # prints its own rows
    recs = []
    for p_dev, (rate, eff) in results.items():
        recs.append({
            "metric": f"halo_gcn_edges_per_s_{p_dev}dev",
            "value": round(rate / 1e9, 4), "unit": "Gedge/s",
            "vs_baseline": None,
            "detail": {"scaling_efficiency": round(eff, 3)}})
    return recs


def bench_halo_comm_model(anchor_recs, n=65_536, e=1_000_000, f=64,
                          communities=64):
    """Comm-volume evidence for the halo path (VERDICT round 4, item
    4): exact per-step halo bytes from the partition tables + an ICI
    cost model predicting scaling efficiency at P=4/8/32, calibrated
    by the measured 1-device kernel rate (halo_gcn_edges_per_s_1dev).
    Host-side only — no multi-chip hardware required; replaces the
    bare >= 75% assertion with bytes and a stated bandwidth
    assumption (sensitivity at half/double bandwidth included)."""
    from pytorch_geometric_tpu.parallel.api import GraphPartition
    from pytorch_geometric_tpu.parallel.partition import partition_graph

    # calibration: the measured 1-dev halo-kernel edge rate
    rate = None
    for r in anchor_recs:
        if r.get("metric") == "halo_gcn_edges_per_s_1dev":
            rate = r["value"] * 1e9
    if rate is None:
        rate = 0.0586e9        # round-4 measured fallback

    rng = np.random.default_rng(0)
    comm = rng.integers(0, communities, n)
    pos_of = np.empty(n, dtype=np.int64)
    pos_of[np.argsort(comm, kind="stable")] = np.arange(n)
    starts = np.searchsorted(np.sort(comm), np.arange(communities))
    counts = np.bincount(comm, minlength=communities)
    src = rng.integers(0, n, e)
    intra = rng.random(e) < 0.9
    c = comm[src]
    dst = np.where(intra,
                   starts[c] + (rng.random(e) * counts[c]).astype(
                       np.int64),
                   rng.integers(0, n, e))
    senders, receivers = pos_of[src], dst
    keep = senders != receivers
    senders, receivers = senders[keep], receivers[keep]

    def model_points(s_, r_, n_, label):
        out = {}
        for P_dev in (4, 8, 32):
            # host-only: shards + tables carry the exact byte counts.
            # dtype_bytes=2: the fast halo path exchanges rows at the
            # kernels' bf16 compute precision in BOTH directions
            # (PartitionedSpmm.apply casts before the all_to_all and
            # the backward cotangent matches the primal width)
            shards, _ = partition_graph(s_, r_, n_, P_dev)
            stats = shards.comm_stats(f, dtype_bytes=2)
            pred = GraphPartition.predict_scaling(
                len(s_), f, stats["halo_bytes_padded_per_dev"],
                P_dev, rate,
                local_edge_frac=1.0 - stats["cut_fraction"])
            out[f"{label}_P{P_dev}"] = {**stats, **pred}
        return out

    per_p = model_points(senders, receivers, n, "small")

    # Reddit-scale point: per-device shards big enough that the local
    # aggregation genuinely covers the collective — the regime the
    # >= 75% claim is about (the small shape above is honest evidence
    # that 2k-node shards at today's kernel rates are comm-bound)
    n2, e2 = 232_965, 20_000_000
    comm2 = rng.integers(0, 200, n2)
    pos2 = np.empty(n2, dtype=np.int64)
    pos2[np.argsort(comm2, kind="stable")] = np.arange(n2)
    st2 = np.searchsorted(np.sort(comm2), np.arange(200))
    cn2 = np.bincount(comm2, minlength=200)
    src2 = rng.integers(0, n2, e2)
    intra2 = rng.random(e2) < 0.9
    c2 = comm2[src2]
    dst2 = np.where(intra2,
                    st2[c2] + (rng.random(e2) * cn2[c2]).astype(
                        np.int64),
                    rng.integers(0, n2, e2))
    s2, r2 = pos2[src2], dst2
    keep2 = s2 != r2
    per_p.update(model_points(s2[keep2], r2[keep2], n2, "reddit20M"))

    rec = {"metric": "halo_comm_model",
           "value": per_p["reddit20M_P8"]["eff"], "unit": "fraction",
           "vs_baseline": None, "synthetic": True,
           "detail": {
               "target": ">= 0.75 predicted scaling efficiency "
               "(north star) at production shard sizes, evidenced by "
               "bytes + model instead of asserted; the small shape's "
               "numbers are reported unvarnished (2k-node shards are "
               "comm-bound at current kernel rates)",
               "calibration_edges_per_s_1dev": rate,
               "model": "T_step = max(T_local, T_comm) + T_remote "
               "(local aggregation overlaps the all_to_all); "
               "eff = (T_1dev/P)/T_step",
               "graphs": {"small": {"n": n, "e": int(len(senders)),
                                    "f": f,
                                    "communities": communities},
                          "reddit20M": {"n": n2,
                                        "e": int(keep2.sum()),
                                        "f": f, "communities": 200}},
               **per_p}}
    print(json.dumps(rec), flush=True)
    return [rec]


def run_scale_suite(e=REDDIT_E, epochs=3):
    records = []
    bench = RedditBench(e=e)
    print(json.dumps({
        "metric": "reddit_setup", "value": round(bench.pack_s, 1),
        "unit": "s", "vs_baseline": None,
        "detail": {"gen_s": round(bench.gen_s, 1),
                   "dense_edge_frac": round(bench.dense_edge_frac, 3),
                   "dense_blocks": bench.n_blocks,
                   "sparse_inflation": round(bench.sparse_inflation, 2),
                   }}), flush=True)
    for job, args in ((bench_reddit_layer, (bench, "gcn", epochs)),
                      (bench_reddit_layer, (bench, "sage", epochs)),
                      (bench_reddit_spmm, (bench,)),
                      (bench_spmm_hbm_fraction, (bench,)),
                      (bench_adversarial_spmm, ()),
                      (bench_halo_1dev, ())):
        try:
            out = job(*args)
            records.extend(out if isinstance(out, list) else [out])
        except Exception as exc:  # noqa: BLE001 — keep the other rows
            print(json.dumps({
                "metric": f"{job.__name__} ERROR",
                "error": f"{type(exc).__name__}: {exc}"}), flush=True)
    try:
        records.extend(bench_halo_comm_model(records))
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"metric": "bench_halo_comm_model ERROR",
                          "error": f"{type(exc).__name__}: {exc}"}),
              flush=True)
    return records


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--e", type=int, default=REDDIT_E)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()
    run_scale_suite(e=args.e, epochs=args.epochs)
