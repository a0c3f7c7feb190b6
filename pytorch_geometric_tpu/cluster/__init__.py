"""Clustering / sampling kernels — the torch-cluster replacement.

Reference counterpart: torch-cluster 1.5.5 wheel (reference
requirement.txt:5): ``graclus_cluster`` (SpectralAnalysis.py:18,356; via
nn.graclus at examples/mnist_graclus.py:39), ``voxel_grid``
(examples/mnist_voxel_grid.py:8,30), ``fps`` + ``radius``
(examples/pointnet++.py:9,39-41), kNN.

These ops are data-dependent and sequential (greedy matching) or
loader-time (sampling) — on TPU they are *host* operations producing
static-shape device inputs, implemented in native C++
(``native/graphcore.cpp``, via ctypes) with numpy fallbacks.
"""

from typing import Optional

import numpy as np

from pytorch_geometric_tpu.cluster._native import (
    as_f64,
    as_i64,
    get_lib,
    ptr_f64,
    ptr_i64,
)


def _np(a):
    return None if a is None else np.asarray(a)


def graclus_cluster(senders, receivers, weight=None, num_nodes=None,
                    seed: int = 0) -> np.ndarray:
    """Greedy weighted matching; returns cluster id per node (= min of the
    matched pair, matching the reference kernel's convention)."""
    s, r = _np(senders), _np(receivers)
    n = int(num_nodes if num_nodes is not None
            else (max(s.max(), r.max()) + 1 if s.size else 0))
    w = _np(weight)
    lib = get_lib()
    out = np.empty(n, dtype=np.int64)
    if lib is not None:
        s64, r64 = as_i64(s), as_i64(r)
        w64 = as_f64(w) if w is not None else None
        lib.graclus_cluster(ptr_i64(s64), ptr_i64(r64), ptr_f64(w64),
                            s64.shape[0], n, seed, ptr_i64(out))
        return out
    # numpy fallback: same greedy scheme
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    out[:] = -1
    adj = [[] for _ in range(n)]
    ww = w if w is not None else np.ones(s.shape[0])
    for e in range(s.shape[0]):
        adj[s[e]].append((ww[e], r[e]))
    for u in order:
        if out[u] != -1:
            continue
        best, best_w = -1, -1.0
        for wv, v in adj[u]:
            if v != u and out[v] == -1 and wv > best_w:
                best_w, best = wv, v
        if best == -1:
            out[u] = u
        else:
            c = min(u, best)
            out[u] = c
            out[best] = c
    return out


def voxel_grid(pos, size, batch=None, start=None, end=None) -> np.ndarray:
    """Grid-cell cluster ids (reference: nn.voxel_grid,
    examples/mnist_voxel_grid.py:30)."""
    p = as_f64(_np(pos))
    if p.ndim == 1:
        p = p[:, None]
    n, dim = p.shape
    size = np.broadcast_to(as_f64(np.atleast_1d(size)), (dim,)).copy()
    start = as_f64(np.atleast_1d(start)) if start is not None \
        else p.min(axis=0)
    end = as_f64(np.atleast_1d(end)) if end is not None else p.max(axis=0)
    start = np.broadcast_to(start, (dim,)).copy()
    end = np.broadcast_to(end, (dim,)).copy()
    b = as_i64(_np(batch)) if batch is not None else None
    lib = get_lib()
    out = np.empty(n, dtype=np.int64)
    if lib is not None:
        lib.voxel_grid(ptr_f64(p), n, dim, ptr_i64(b), ptr_f64(size),
                       ptr_f64(start), ptr_f64(end), ptr_i64(out))
        return out
    cells = np.maximum(np.floor((end - start) / size).astype(np.int64) + 1,
                       1)
    c = np.clip(np.floor((p - start) / size).astype(np.int64), 0,
                cells - 1)
    idx = np.zeros(n, dtype=np.int64)
    for d in range(dim):
        idx = idx * cells[d] + c[:, d]
    if b is not None:
        idx += b * int(np.prod(cells))
    return idx


def fps(pos, batch=None, ratio: float = 0.5, random_start: bool = True,
        seed: int = 0) -> np.ndarray:
    """Farthest point sampling (reference: nn.fps,
    examples/pointnet++.py:39)."""
    p = as_f64(_np(pos))
    n, dim = p.shape
    b = as_i64(_np(batch)) if batch is not None else None
    lib = get_lib()
    out = np.empty(n, dtype=np.int64)
    if lib is not None:
        cnt = lib.fps(ptr_f64(p), n, dim, ptr_i64(b), float(ratio),
                      int(random_start), seed, ptr_i64(out))
        return out[:cnt]
    # numpy fallback
    rng = np.random.default_rng(seed)
    bs = b if b is not None else np.zeros(n, dtype=np.int64)
    res = []
    for gb in np.unique(bs):
        idx = np.flatnonzero(bs == gb)
        k = max(int(np.ceil(ratio * len(idx))), 1)
        dist = np.full(len(idx), np.inf)
        cur = rng.integers(0, len(idx)) if random_start else 0
        for _ in range(k):
            res.append(idx[cur])
            d2 = np.sum((p[idx] - p[idx[cur]]) ** 2, axis=1)
            dist = np.minimum(dist, d2)
            cur = int(np.argmax(dist))
    return np.asarray(res, dtype=np.int64)


def radius(x, y, r, batch_x=None, batch_y=None,
           max_num_neighbors: int = 32):
    """Neighbors of y within radius r among x; returns (row=y, col=x)
    (reference: nn.radius, examples/pointnet++.py:40-41)."""
    xx, yy = as_f64(_np(x)), as_f64(_np(y))
    if xx.ndim == 1:
        xx, yy = xx[:, None], yy[:, None]
    nx, dim = xx.shape
    ny = yy.shape[0]
    bx = as_i64(_np(batch_x)) if batch_x is not None else None
    by = as_i64(_np(batch_y)) if batch_y is not None else None
    lib = get_lib()
    cap = ny * max_num_neighbors
    row = np.empty(cap, dtype=np.int64)
    col = np.empty(cap, dtype=np.int64)
    if lib is not None:
        cnt = lib.radius(ptr_f64(xx), nx, ptr_f64(yy), ny, dim,
                         ptr_i64(bx), ptr_i64(by), float(r),
                         max_num_neighbors, ptr_i64(row), ptr_i64(col))
        return row[:cnt], col[:cnt]
    rows, cols = [], []
    for i in range(ny):
        m = np.ones(nx, dtype=bool) if bx is None else (bx == (
            by[i] if by is not None else 0))
        d2 = np.sum((xx - yy[i]) ** 2, axis=1)
        cand = np.flatnonzero(m & (d2 <= r * r))[:max_num_neighbors]
        rows.extend([i] * len(cand))
        cols.extend(cand.tolist())
    return (np.asarray(rows, dtype=np.int64),
            np.asarray(cols, dtype=np.int64))


def knn(x, y, k, batch_x=None, batch_y=None):
    """k nearest x-neighbors per y row; returns (row=y, col=x)."""
    xx, yy = as_f64(_np(x)), as_f64(_np(y))
    if xx.ndim == 1:
        xx, yy = xx[:, None], yy[:, None]
    nx, dim = xx.shape
    ny = yy.shape[0]
    bx = as_i64(_np(batch_x)) if batch_x is not None else None
    by = as_i64(_np(batch_y)) if batch_y is not None else None
    lib = get_lib()
    cap = ny * k
    row = np.empty(cap, dtype=np.int64)
    col = np.empty(cap, dtype=np.int64)
    if lib is not None:
        cnt = lib.knn(ptr_f64(xx), nx, ptr_f64(yy), ny, dim, ptr_i64(bx),
                      ptr_i64(by), k, ptr_i64(row), ptr_i64(col))
        return row[:cnt], col[:cnt]
    rows, cols = [], []
    for i in range(ny):
        m = np.ones(nx, dtype=bool) if bx is None else (bx == (
            by[i] if by is not None else 0))
        d2 = np.where(m, np.sum((xx - yy[i]) ** 2, axis=1), np.inf)
        kk = min(k, int(m.sum()))
        cand = np.argpartition(d2, kk - 1)[:kk]
        cand = cand[np.argsort(d2[cand])]
        rows.extend([i] * kk)
        cols.extend(cand.tolist())
    return (np.asarray(rows, dtype=np.int64),
            np.asarray(cols, dtype=np.int64))


def knn_graph(pos, k, batch=None, loop=False):
    """kNN edges within one point set: (senders=neighbor, receivers=i)."""
    row, col = knn(pos, pos, k + (0 if loop else 1), batch, batch)
    if not loop:
        keep = row != col
        row, col = row[keep], col[keep]
    return col, row  # senders, receivers


def coalesce_edges(senders, receivers, edge_attr=None, num_nodes=None):
    """Sort by (receiver, sender) + merge duplicates (sums attr) —
    reference torch-sparse coalesce."""
    s, r = as_i64(_np(senders)), as_i64(_np(receivers))
    e = s.shape[0]
    n = int(num_nodes if num_nodes is not None
            else (max(s.max(), r.max()) + 1 if e else 0))
    a = _np(edge_attr)
    lib = get_lib()
    if lib is not None:
        a2 = as_f64(a.reshape(e, -1)) if a is not None else None
        ad = a2.shape[1] if a2 is not None else 0
        s_out = np.empty(e, dtype=np.int64)
        r_out = np.empty(e, dtype=np.int64)
        a_out = np.empty((e, ad)) if a2 is not None else None
        cnt = lib.coalesce(ptr_i64(s), ptr_i64(r), ptr_f64(a2), e, ad, n,
                           ptr_i64(s_out), ptr_i64(r_out), ptr_f64(a_out))
        ra = None
        if a is not None:
            ra = a_out[:cnt].reshape((cnt,) + a.shape[1:]).astype(a.dtype)
        return s_out[:cnt], r_out[:cnt], ra
    key = r.astype(np.int64) * n + s
    order = np.argsort(key, kind="stable")
    key = key[order]
    uniq, first = np.unique(key, return_index=True)
    s2, r2 = s[order][first], r[order][first]
    ra = None
    if a is not None:
        seg = np.searchsorted(uniq, key)
        ra = np.zeros((uniq.shape[0],) + a.shape[1:], dtype=a.dtype)
        np.add.at(ra, seg, a[order])
    return s2, r2, ra


def sample_neighbors(indptr, indices, seeds, k, seed: int = 0):
    """Uniform k-in-neighbor sampling per seed over a CSR graph (host
    pipeline for sampled mini-batch training)."""
    ip, ix = as_i64(_np(indptr)), as_i64(_np(indices))
    sd = as_i64(_np(seeds))
    lib = get_lib()
    cap = sd.shape[0] * k
    src = np.empty(cap, dtype=np.int64)
    dst = np.empty(cap, dtype=np.int64)
    if lib is not None:
        cnt = lib.sample_neighbors(ptr_i64(ip), ptr_i64(ix), ptr_i64(sd),
                                   sd.shape[0], k, seed, ptr_i64(src),
                                   ptr_i64(dst))
        return src[:cnt], dst[:cnt]
    rng = np.random.default_rng(seed)
    srcs, dsts = [], []
    for v in sd:
        nbrs = ix[ip[v]:ip[v + 1]]
        if len(nbrs) > k:
            nbrs = rng.choice(nbrs, size=k, replace=False)
        srcs.extend(nbrs.tolist())
        dsts.extend([int(v)] * len(nbrs))
    return (np.asarray(srcs, dtype=np.int64),
            np.asarray(dsts, dtype=np.int64))


__all__ = [
    "graclus_cluster", "voxel_grid", "fps", "radius", "knn", "knn_graph",
    "coalesce_edges", "sample_neighbors",
]
