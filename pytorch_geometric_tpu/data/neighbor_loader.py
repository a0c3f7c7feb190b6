"""Neighbor-sampled mini-batch loader (GraphSAGE-style).

The reference's sampled-minibatch counterpart is PPI/Reddit training
(examples/ppi.py:11-16; SURVEY §5 long-context row: host-pipelined
neighbor sampling is the TPU analog of scaling the sequence).  This
loader implements the north-star config "GraphSAGE + NeighborSampler on
PPI/Reddit":

- host-side CSR of in-edges (built once; native C++ sampler from
  ``cluster.sample_neighbors`` when available),
- per batch: multi-hop uniform sampling from seed nodes, compacted to
  local ids, padded to static budgets -> one compiled shape per loader,
- the output Graph carries ``seed_mask`` (loss is evaluated on seeds
  only) and layer-wise edge sets are merged (standard SAGE full-depth
  subgraph form).
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.cluster import sample_neighbors
from pytorch_geometric_tpu.data.graph import Graph


class NeighborSampler:
    """Iterates padded sampled subgraphs over seed-node batches."""

    def __init__(self, senders, receivers, num_nodes: int,
                 sizes: Sequence[int], node_features=None, labels=None,
                 batch_size: int = 512, shuffle: bool = True,
                 seed_nodes=None, seed: int = 0,
                 materialize_features: bool = True,
                 prefetch: int = 0):
        """``materialize_features=False`` ships INDICES only: batches
        carry no x/y; the consumer keeps the full feature/label tables
        device-resident and gathers rows in-jit via
        ``extras['local_to_global']``.  The materialized path pads x to
        the node budget (~137 MB/batch at Reddit fanout [10, 10]) and
        re-transfers it host->device every batch — measured 3.3 s/batch
        through the remote tunnel vs milliseconds for the index path.

        ``prefetch > 0`` pipelines sampling ON THE HOST (SURVEY §5
        north star; the reference counterpart is the worker-overlapped
        torch DataLoader under examples/ppi.py:14-16): a background
        thread runs the CSR walks and fills a bounded queue of ready
        (device-uploaded) batches while the device executes the current
        step, so epoch wall-clock approaches
        max(sampler, device) instead of their sum."""
        senders = np.asarray(senders, dtype=np.int64)
        receivers = np.asarray(receivers, dtype=np.int64)
        self.num_nodes = int(num_nodes)
        self.sizes = list(sizes)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.materialize_features = bool(materialize_features)
        self.x = None if node_features is None else \
            np.asarray(node_features)
        self.y = None if labels is None else np.asarray(labels)
        self.seed_nodes = np.arange(num_nodes) if seed_nodes is None \
            else np.asarray(seed_nodes)
        self.prefetch = int(prefetch)

        # CSR over receivers (in-neighbors per node)
        order = np.argsort(receivers, kind="stable")
        self._indices = senders[order]
        counts = np.bincount(receivers, minlength=num_nodes)
        self._indptr = np.concatenate([[0], np.cumsum(counts)])

        # static budgets
        frontier = batch_size
        n_budget = batch_size
        e_budget = 0
        for s in self.sizes:
            e_budget += frontier * s
            frontier = frontier * s
            n_budget += frontier
        self.node_budget = n_budget + 1      # +1 padding node
        self.edge_budget = max(e_budget, 1)

    def __len__(self):
        return -(-len(self.seed_nodes) // self.batch_size)

    # ---- packed single-buffer batches --------------------------------
    # Through a dispatch-expensive backend (the remote tunnel here), a
    # batch's ~8 per-leaf uploads cost ~3 ms EACH; `iter_packed()`
    # yields ONE int32 buffer per batch (one upload) and `unpack(buf)`
    # rebuilds the Graph INSIDE the consumer's jit (zero extra
    # dispatches) — measured 2x on the sampled-epoch wall-clock.

    def _pack_specs(self):
        if getattr(self, "_specs", None) is None:
            assert not self.materialize_features, \
                "packed batches require the index-shipping mode " \
                "(materialize_features=False): all leaves are integral"
            # derive static specs from a throwaway sample without
            # consuming the RNG stream
            state = self._rng.bit_generator.state
            g0 = self._sample(self.seed_nodes[: self.batch_size],
                              to_device=False)
            self._rng.bit_generator.state = state
            leaves, treedef = jax.tree_util.tree_flatten(g0)
            self._specs = ([(l.shape, l.dtype) for l in leaves],
                           treedef)
        return self._specs

    def pack_batch(self, g_np: Graph) -> np.ndarray:
        """Flatten a host-side (numpy) batch into one int32 buffer."""
        leaves, _ = jax.tree_util.tree_flatten(g_np)
        return np.concatenate(
            [np.asarray(l).astype(np.int32).reshape(-1)
             for l in leaves])

    def unpack(self, buf) -> Graph:
        """Rebuild the Graph from a packed buffer — call INSIDE jit."""
        specs, treedef = self._pack_specs()
        out, off = [], 0
        for shape, dtype in specs:
            n = int(np.prod(shape))
            out.append(buf[off: off + n].reshape(shape).astype(dtype))
            off += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def iter_packed(self):
        """Like ``__iter__`` but yields uploaded packed buffers (one
        device transfer per batch); honours ``prefetch``."""
        seeds = self.seed_nodes.copy()
        if self.shuffle:
            self._rng.shuffle(seeds)
        batches = [seeds[s: s + self.batch_size]
                   for s in range(0, len(seeds), self.batch_size)]
        self._pack_specs()

        if self.prefetch <= 0:
            for b in batches:
                yield jnp.asarray(self.pack_batch(
                    self._sample(b, to_device=False)))
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        done = object()

        def produce():
            try:
                for b in batches:
                    buf = self.pack_batch(
                        self._sample(b, to_device=False))
                    while not stop.is_set():
                        try:
                            q.put(buf, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
                q.put(done)
            except BaseException as exc:
                q.put(exc)

        t = threading.Thread(target=produce, daemon=True,
                             name="neighbor-sampler-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield jnp.asarray(item)
        finally:
            stop.set()

    def __iter__(self):
        seeds = self.seed_nodes.copy()
        if self.shuffle:
            self._rng.shuffle(seeds)
        batches = [seeds[s: s + self.batch_size]
                   for s in range(0, len(seeds), self.batch_size)]
        if self.prefetch <= 0:
            for b in batches:
                yield self._sample(b)
            return
        yield from self._iter_prefetched(batches)

    def _iter_prefetched(self, batches):
        """Producer thread samples + uploads ahead of the consumer
        through a bounded queue (double/N-buffered H2D).  The producer
        is the only caller of ``self._rng`` while it runs, and it
        shuts down promptly when the consumer abandons the epoch."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        done = object()

        def produce():
            try:
                for b in batches:
                    # numpy-only in the producer: device uploads from a
                    # second thread contend with the consumer's step
                    # RPCs on the single device connection (measured:
                    # pipelined epoch SLOWER than serial with in-thread
                    # jnp.asarray) — the consumer uploads on yield
                    g = self._sample(b, to_device=False)
                    while not stop.is_set():
                        try:
                            q.put(g, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
                q.put(done)
            except BaseException as exc:  # surface in the consumer
                q.put(exc)

        t = threading.Thread(target=produce, daemon=True,
                             name="neighbor-sampler-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                if isinstance(item, BaseException):
                    raise item
                # per-leaf upload in the CONSUMER: a packed
                # one-buffer + jitted-split variant was measured 50%
                # SLOWER on the remote backend (each jit output is
                # fetched as its own remote handle), and uploads from
                # the producer thread contend with the step RPCs
                yield jax.tree_util.tree_map(jnp.asarray, item)
        finally:
            stop.set()

    def _sample(self, seeds: np.ndarray, to_device: bool = True
                ) -> Graph:
        all_src, all_dst = [], []
        frontier = seeds
        for k in self.sizes:
            src, dst = sample_neighbors(
                self._indptr, self._indices, frontier, k,
                seed=int(self._rng.integers(2 ** 31)))
            all_src.append(src)
            all_dst.append(dst)
            frontier = np.unique(src)
        src = np.concatenate(all_src) if all_src else \
            np.empty(0, np.int64)
        dst = np.concatenate(all_dst) if all_dst else \
            np.empty(0, np.int64)

        # compact: seeds first (so seed rows are 0..B-1), then the rest
        nodes = np.concatenate([seeds, src, dst])
        uniq = np.unique(nodes)
        rest = np.setdiff1d(uniq, seeds, assume_unique=False)
        local_ids = np.concatenate([seeds, rest])
        # vectorised global->local lookup (the Python dict loop held
        # the GIL for ~ms per batch, starving the consumer thread's
        # dispatch when prefetching)
        lorder = np.argsort(local_ids, kind="stable")
        sorted_ids = local_ids[lorder]
        n_real = len(local_ids)
        e_real = len(src)

        N, E = self.node_budget, self.edge_budget
        # budgets are derived from the per-hop fan-out caps, so overflow
        # is impossible for a correct sampler; fail loud rather than
        # silently corrupting indices if that invariant ever breaks
        if n_real + 1 > N or e_real > E:
            raise RuntimeError(
                f"sampled subgraph exceeds static budget "
                f"({n_real + 1}>{N} nodes or {e_real}>{E} edges) — "
                "sampler invariant violated")

        s_local = np.full(E, n_real, np.int32)
        d_local = np.full(E, n_real, np.int32)
        s_local[:e_real] = lorder[np.searchsorted(sorted_ids, src)]
        d_local[:e_real] = lorder[np.searchsorted(sorted_ids, dst)]
        edge_mask = np.zeros(E, bool)
        edge_mask[:e_real] = True
        node_mask = np.zeros(N, bool)
        node_mask[:n_real] = True
        seed_mask = np.zeros(N, bool)
        seed_mask[: len(seeds)] = True

        x = None
        if self.x is not None and self.materialize_features:
            x = np.zeros((N,) + self.x.shape[1:], np.float32)
            x[:n_real] = self.x[local_ids]
        y = None
        if self.y is not None and self.materialize_features:
            y = np.zeros((N,) + self.y.shape[1:], self.y.dtype)
            y[:n_real] = self.y[local_ids]

        # sort by receiver for the fast segment path
        order = np.argsort(d_local, kind="stable")
        # to_device=False keeps numpy leaves (the prefetch producer
        # must not issue device uploads from its thread)
        conv = jnp.asarray if to_device else (lambda a: a)
        return Graph(
            senders=conv(s_local[order]),
            receivers=conv(d_local[order]),
            x=None if x is None else conv(x),
            y=None if y is None else conv(y),
            node_mask=conv(node_mask),
            edge_mask=conv(edge_mask[order]),
            extras={"seed_mask": conv(seed_mask),
                    # padding rows point at the SENTINEL id num_nodes:
                    # gathers through device_tables() (which appends a
                    # zero row) read zeros, never node 0's features
                    # (ADVICE round 4).  Gathers from an unexpanded
                    # (num_nodes, F) table clamp to the last row —
                    # harmless only while padded rows stay masked.
                    "local_to_global": conv(
                        np.concatenate([local_ids, np.full(
                            N - n_real, self.num_nodes,
                            np.int64)]).astype(np.int32))},
            num_graphs=1, edges_sorted=True)

    def device_tables(self, *arrays):
        """Append one zero row to each (num_nodes, ...) table so the
        sentinel padding id ``num_nodes`` gathers zeros.  Keep the
        returned arrays device-resident and gather batch rows in-jit
        via ``extras['local_to_global']`` (the index-shipping path)."""
        out = []
        for a in arrays:
            a = np.asarray(a)
            out.append(jnp.asarray(np.concatenate(
                [a, np.zeros((1,) + a.shape[1:], a.dtype)])))
        return out[0] if len(out) == 1 else tuple(out)
