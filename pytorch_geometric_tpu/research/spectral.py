"""Weight-matrix spectral analysis + Fiedler weight correction.

Reference counterpart: SpectralAnalysis.py — ``WeightsToAdjaency`` (:43),
``Compute_fiedler_vector`` (:208-217, cupy eigh), ``Fiedler_vector_cluster``
(:219-239), ``WeightedLinkPrediction`` (:253-289), ``WeightCorrection``
(:312-430), ``power_iteration`` (:437).

TPU redesign: the GPU dense eigendecomposition (cupy) becomes
``jnp.linalg.eigh`` on device; graph bookkeeping stays host-side
networkx, exactly like the reference's host/device split (SURVEY §3.3).
Weight pytrees replace ``state_dict`` — corrections are returned as a new
pytree, not mutated in place.
"""

import math
from functools import lru_cache as _lru_cache
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import networkx as nx
import numpy as np

from pytorch_geometric_tpu.research import link_prediction as lp


def weights_to_adjacency(weights: np.ndarray, start_node: int = 0,
                         max_edges: int = 0
                         ) -> Tuple[nx.Graph, nx.Graph]:
    """Bipartite (inputs x outputs) graph of one weight matrix; node ids
    offset by ``start_node`` (reference WeightsToAdjaency semantics:
    rows first, then columns).  ``max_edges > 0`` keeps only the
    largest-|w| entries — bounds the O(M*N) graph build for wide layers
    (the reference ran this on already-pruned small nets)."""
    M, N = weights.shape
    rows, cols = np.meshgrid(np.arange(M), np.arange(N), indexing="ij")
    rows, cols = rows.reshape(-1), cols.reshape(-1)
    vals = np.asarray(weights).reshape(-1)
    if max_edges and vals.size > max_edges:
        keep = np.argpartition(-np.abs(vals), max_edges)[:max_edges]
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    Gw = nx.Graph()
    Gu = nx.Graph()
    Gw.add_nodes_from(range(start_node, start_node + M + N))
    Gu.add_nodes_from(range(start_node, start_node + M + N))
    edges = [(start_node + int(i), start_node + M + int(j), float(v))
             for i, j, v in zip(rows, cols, vals)]
    Gw.add_weighted_edges_from(edges)
    Gu.add_edges_from((u, v) for u, v, _ in edges)
    return Gw, Gu


#: device-path state: flipped off after the first device failure so the
#: pipeline degrades to the host path without re-raising per call
_FIEDLER_STATE = {"device_ok": True}
#: graphs below this size stay on host eigh — the RPC dispatch to the
#: remote chip costs more than the whole decomposition
_DEVICE_MIN_NODES = 192


@_lru_cache(maxsize=32)
def _fiedler_device_fn(n_pad: int, iters: int):
    """jit'd deflated power iteration on the (padded) normalised
    Laplacian — matmul-only, so it is safe on the remote TPU worker
    where dense ``eigh``/``svd`` crash the process (PERF.md round 4).
    Mirrors the reference's own iterative fallback
    (SpectralAnalysis.py:437 power_iteration), deflated to reach the
    SECOND-smallest pair: with An the masked normalised adjacency,
    M v = mask * (v + An v) has eigenvalues 2 - eig(L) on the real
    subspace, so its dominant pair is L's smallest and one deflation
    step yields the Fiedler pair."""
    import jax

    def run(A, mask, v2_init):
        d = A.sum(axis=1)
        dis = jnp.where(d > 0, jax.lax.rsqrt(jnp.maximum(d, 1e-30)),
                        0.0)
        An = (dis[:, None] * A) * dis[None, :]
        An = (An + An.T) / 2.0

        def norm(v):
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

        v1 = norm(mask)
        v2 = v2_init * mask
        v2 = norm(v2 - (v1 @ v2) * v1)

        def body(_, carry):
            v1, v2 = carry
            w1 = mask * (v1 + An @ v1)
            v1 = norm(w1)
            w2 = mask * (v2 + An @ v2)
            w2 = w2 - (v1 @ w2) * v1
            return v1, norm(w2)

        v1, v2 = jax.lax.fori_loop(0, iters, body, (v1, v2))
        lam2 = (v2 * mask) @ v2 - v2 @ (An @ v2)
        return lam2, v2

    return jax.jit(run)


def _fiedler_device(A: np.ndarray, iters: int = 512):
    """Device Fiedler pair of |A|'s normalised Laplacian; pads to the
    next power of two so the compile cache stays O(log n)."""
    n = A.shape[0]
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
    Ap = np.zeros((n_pad, n_pad), np.float32)
    Ap[:n, :n] = A
    mask = np.zeros(n_pad, np.float32)
    mask[:n] = 1.0
    v2 = np.random.default_rng(0).normal(size=n_pad).astype(np.float32)
    lam2, vec = _fiedler_device_fn(n_pad, iters)(
        jnp.asarray(Ap), jnp.asarray(mask), jnp.asarray(v2))
    return float(lam2), np.asarray(vec)[:n].astype(np.float64)


def compute_fiedler_vector(G: nx.Graph, use_device: bool = None):
    """(algebraic connectivity, Fiedler vector) of the normalised
    Laplacian (replaces the reference's cupy eigh,
    SpectralAnalysis.py:208-217).

    Two backends (VERDICT round 4, item 8):

    - **device** (default for graphs >= ``_DEVICE_MIN_NODES``): deflated
      power iteration — matmuls only, compiled once per padded size, so
      the fine-tune correction step stays off the host O(n^3) path AND
      off XLA's dense eigendecomposition (which crashes the remote v5e
      worker — the round-4 measured hazard).
    - **host** numpy eigh: small graphs and the fallback when the
      device path errors (state is remembered; no per-call re-raise).
    """
    # |w| magnitudes: the reference feeds SIGNED weights into the
    # normalised Laplacian (SpectralAnalysis.py:208-217), whose
    # negative degrees make sqrt(d) NaN — undefined under cupy and
    # numpy alike.  Connectivity is about coupling magnitude, so the
    # spectral step runs on |A| (signed weights still drive the
    # link-prediction scores downstream).
    A = np.abs(nx.to_numpy_array(G, weight="weight"))
    n = A.shape[0]
    use = (_FIEDLER_STATE["device_ok"] and n >= _DEVICE_MIN_NODES) \
        if use_device is None else use_device
    if use:
        try:
            return _fiedler_device(A)
        except Exception:
            _FIEDLER_STATE["device_ok"] = False
    d = A.sum(axis=1)
    dis = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-30)), 0.0)
    lap = np.eye(A.shape[0]) - (dis[:, None] * A) * dis[None, :]
    lap = (lap + lap.T) / 2.0
    w, v = np.linalg.eigh(lap)
    return np.real(w[1]), np.real(v[:, 1])


def fiedler_vector_cluster(G: nx.Graph) -> List[nx.Graph]:
    """Split G into the two sign-classes of its Fiedler vector; returns
    the (nonempty) induced subgraphs (reference :219-239)."""
    if G.number_of_edges() == 0:
        return [G]
    _, vec = compute_fiedler_vector(G)
    nodes = list(G.nodes())
    part_one = [nodes[i] for i in range(len(nodes)) if vec[i] < 0]
    part_two = [nodes[i] for i in range(len(nodes)) if vec[i] >= 0]
    out = []
    for part in (part_one, part_two):
        sub = G.subgraph(part).copy()
        if sub.number_of_edges() > 0:
            out.append(sub)
    return out or [G]


def recursive_fiedler_partition(G: nx.Graph, num_classes: int
                                ) -> Dict[int, List[int]]:
    """Recursive bipartition until >= num_classes parts (reference
    WeightCorrection's loop at :365-382)."""
    parts = [G]
    max_iter = int(math.floor(math.log(max(num_classes, 2), 2))) + 1
    it = 0
    while len(parts) < num_classes and it < max_iter:
        nxt = []
        for sub in parts:
            if sub.number_of_edges() > 0:
                nxt.extend(fiedler_vector_cluster(sub))
            else:
                nxt.append(sub)
        parts = nxt
        it += 1
    return {lab: list(sub.nodes()) for lab, sub in enumerate(parts)}


def graclus_partition(G: nx.Graph, num_classes: int,
                      seed: int = 0) -> Dict[int, List[int]]:
    """Cluster the composed weight graph with greedy graclus matching
    (reference SpectralAnalysis.py:18,356 runs ``graclus_cluster`` on
    the composed graph's weighted edge list).  One matching pass halves
    the cluster count, so coarsen repeatedly until at most
    ``max(num_classes, 2)`` clusters remain — the multi-level use of the
    same kernel that nn/pool/coarsen.py applies to data graphs.
    """
    from pytorch_geometric_tpu.cluster import graclus_cluster

    nodes = list(G.nodes())
    idx = {u: i for i, u in enumerate(nodes)}
    s, r, w = [], [], []
    for u, v, d in G.edges(data=True):
        if "weight" in d:
            s.append(idx[u])
            r.append(idx[v])
            w.append(abs(float(d["weight"])))
    member = np.arange(len(nodes))          # node -> current cluster id
    s, r, w = np.asarray(s), np.asarray(r), np.asarray(w)
    n = len(nodes)
    for level in range(32):
        if n <= max(num_classes, 2) or s.size == 0:
            break
        cl = graclus_cluster(s, r, weight=w, num_nodes=n,
                             seed=seed + level)
        uniq, compact = np.unique(cl, return_inverse=True)
        if len(uniq) >= n:                  # no progress: all singletons
            break
        member = compact[member]
        # coarsen the edge list; drop intra-cluster edges
        s, r = compact[s], compact[r]
        keep = s != r
        s, r, w = s[keep], r[keep], w[keep]
        n = len(uniq)
    out: Dict[int, List[int]] = {}
    for u, c in zip(nodes, member):
        out.setdefault(int(c), []).append(u)
    return {lab: mem for lab, (_, mem) in
            enumerate(sorted(out.items()))}


def weighted_link_prediction(G: nx.Graph, clusters: Dict[int, List[int]],
                             method: str, vector_pairs: int
                             ) -> List[Tuple[int, int, float]]:
    """Within each cluster, repeatedly take the (argmax, argmin) Fiedler
    pair as a suspected 'wrong link' and score it with the chosen
    link-prediction method (reference :253-289)."""
    scorer = lp.METHODS[method]
    out = []
    for nodes in clusters.values():
        sub = nx.Graph()
        sub.add_nodes_from(nodes)
        node_set = set(nodes)
        for (i, j, d) in G.edges(data=True):
            if i in node_set and j in node_set and "weight" in d:
                sub.add_edge(i, j, weight=d["weight"])
        if sub.number_of_edges() < 2:
            continue
        _, vec = compute_fiedler_vector(sub)
        sub_nodes = list(sub.nodes())
        vec = vec.copy()
        for _ in range(vector_pairs):
            if len(vec) < 2 or vec.min() >= 0:
                break
            locx = int(np.argmax(vec))
            locy = int(np.argmin(vec))
            start, end = sub_nodes[locx], sub_nodes[locy]
            wrong = [tuple(sorted((start, end)))]
            vec = np.delete(vec, [locx, locy])
            del sub_nodes[max(locx, locy)]
            del sub_nodes[min(locx, locy)]
            for u, v, p in scorer(sub, wrong):
                out.append((u, v, float(p)))
    return out


def layer_weight_items(params) -> List[Tuple[str, np.ndarray]]:
    """Flatten a pytree of params into (path, 2-D weight) items, mirroring
    the reference's state_dict filter ('layers'+'weight',
    SpectralAnalysis.py:332-338)."""
    import jax

    items = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        arr = np.asarray(leaf)
        if arr.ndim == 3 and arr.shape[0] == 1:
            arr = arr[0]
        if arr.ndim == 2 and "weight" in name.lower():
            items.append((name, arr))
    return items


def weight_correction(params, num_classes: int,
                      method: str = "resource_allocation_index",
                      vector_pairs: int = 2,
                      correction_coeff: float = 0.001,
                      max_layer_nodes: int = 2000,
                      max_layer_edges: int = 50_000,
                      clustering: str = "fiedler",
                      dump: dict = None):
    """The reference's WeightCorrection (:312-430) over a param pytree:

    1. first two 2-D weight matrices -> composed bipartite weight graph;
    2. cluster it — ``clustering='fiedler'`` recursive bipartition
       (reference :365-382) or ``'graclus'`` greedy matching on the
       weighted edge list (reference :356);
    3. per-cluster wrong-link scoring via link prediction;
    4. add correction_coeff * score to the corresponding weight entries.

    Returns (new_params, corrections_applied).
    """
    import jax

    items = layer_weight_items(params)
    if not items:
        return params, 0
    graphs = []
    start = 0
    spans = []
    for name, w in items:
        # skip layers too wide for the dense spectral machinery (the
        # reference ran on already-contracted nets); compose at most two
        # layers like the reference (SpectralAnalysis.py:348)
        if sum(w.shape) > max_layer_nodes or len(graphs) >= 2:
            continue
        Gw, _ = weights_to_adjacency(w, start, max_edges=max_layer_edges)
        spans.append((name, start, w.shape))
        graphs.append(Gw)
        start += sum(w.shape)
    if not graphs:
        return params, 0
    G = graphs[0]
    for g2 in graphs[1:]:
        G = nx.compose(G, g2)

    if clustering == "graclus":
        clusters = graclus_partition(G, num_classes)
    else:
        clusters = recursive_fiedler_partition(G, num_classes)
    if dump is not None and len(clusters) > 4:
        # persist (graph, partition) for PlotGraphPartition-style viz
        # (reference SpectralAnalysis.py saves classiResultsFiles /
        # GraphResultsFiles pickles when the partition is rich enough)
        import os
        import pickle

        base = os.path.join(dump.get("results_dir", "Results"),
                            "PartitionResults")
        os.makedirs(base, exist_ok=True)
        tag = (f"{dump.get('dataset', 'ds')}-"
               f"{dump.get('model_name', 'model')}")
        epoch = dump.get("epoch", 0)
        with open(os.path.join(
                base, f"{tag}-GraphEpoch_{epoch}.pkl"), "wb") as f:
            pickle.dump(G, f)
        with open(os.path.join(
                base, f"{tag}-oneClassNodeEpoch_{epoch}.pkl"),
                "wb") as f:
            pickle.dump(clusters, f)
    pred = weighted_link_prediction(G, clusters, method, vector_pairs)
    if not pred:
        return params, 0

    # apply corrections back into the pytree
    deltas = {name: np.zeros(shape) for name, _, shape in spans}
    applied = 0
    for u, v, p in pred:
        a, b = min(u, v), max(u, v)
        for name, base, (M, N) in spans:
            if base <= a < base + M and base + M <= b < base + M + N:
                deltas[name][a - base, b - base - M] += \
                    correction_coeff * p
                applied += 1

    def fix(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if name in deltas:
            d = deltas[name]
            arr = np.asarray(leaf)
            if arr.ndim == 3 and arr.shape[0] == 1:
                return leaf + jnp.asarray(d, leaf.dtype)[None]
            return leaf + jnp.asarray(d, leaf.dtype)
        return leaf

    new_params = jax.tree_util.tree_map_with_path(fix, params)
    return new_params, applied


def eigenvalue(A, v):
    return v @ (A @ v)


def power_iteration(A, num_iters: int = 100, tol: float = 0.01):
    """Dominant eigenpair by power iteration (reference :437-452)."""
    n, d = A.shape
    v = np.ones(d) / np.sqrt(d)
    ev = eigenvalue(A, v)
    for _ in range(num_iters):
        Av = A @ v
        v_new = Av / np.linalg.norm(Av)
        ev_new = eigenvalue(A, v_new)
        if np.abs(ev - ev_new) < tol:
            return ev_new, v_new
        v, ev = v_new, ev_new
    return ev, v
