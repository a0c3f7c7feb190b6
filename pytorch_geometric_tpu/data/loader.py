"""Loaders: host-side batching pipelines feeding padded device Graphs.

Reference counterparts:

- ``DataLoader``      — block-diagonal collation + ``batch`` vector
                        (examples/mutag_gin.py:14-15).
- ``DataListLoader``  — yields Python lists of graphs, the input to
                        multi-device data parallelism
                        (examples/data_parallel.py:6,12; ConvexPruning.py:460).
- ``DenseDataLoader`` — stacks equal-size dense tensors for DiffPool
                        (examples/enzymes_diff_pool.py:8,32-34).

TPU twist: every loader pads to bucketed budgets (see
:func:`pytorch_geometric_tpu.data.batch.bucket_size`) so a full epoch
touches only a handful of compiled shapes.  Budgets are precomputed from
the dataset ("one budget per loader") by default — a single compile for
the whole epoch.
"""

from typing import Iterator, List, Optional, Sequence

import numpy as np

from pytorch_geometric_tpu.data.batch import bucket_size, collate
from pytorch_geometric_tpu.data.data import Data
from pytorch_geometric_tpu.data.graph import Graph


class DataLoader:
    """Iterate padded, collated ``Graph`` batches over a dataset."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_nodes: Optional[int] = None,
                 num_edges: Optional[int] = None,
                 dynamic_buckets: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.dynamic_buckets = dynamic_buckets
        self._rng = np.random.default_rng(seed)
        # One static budget for the whole loader: max over a worst-case
        # batch (batch_size largest graphs), bucketed.  With
        # dynamic_buckets each batch instead pads to its own rung of the
        # geometric ladder — less padding waste for heterogeneous
        # datasets at the cost of O(log sizes) compiled shapes.
        if num_nodes is None or num_edges is None:
            sizes_n = sorted((d.num_nodes for d in dataset), reverse=True)
            sizes_e = sorted((d.num_edges for d in dataset), reverse=True)
            worst_n = sum(sizes_n[:batch_size]) + 1
            worst_e = max(sum(sizes_e[:batch_size]), 1)
            num_nodes = num_nodes or bucket_size(worst_n)
            num_edges = num_edges or bucket_size(worst_e)
        self.num_nodes = num_nodes
        self.num_edges = num_edges
        self.num_graphs = batch_size + 1

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Graph]:
        idx = self._order()
        bs = self.batch_size
        for start in range(0, len(idx), bs):
            chunk = idx[start:start + bs]
            if self.drop_last and len(chunk) < bs:
                break
            datas = [self.dataset[int(i)] for i in chunk]
            if self.dynamic_buckets:
                nn_ = bucket_size(sum(d.num_nodes for d in datas) + 1)
                ne_ = bucket_size(max(sum(d.num_edges for d in datas), 1))
                yield collate(datas, num_nodes=min(nn_, self.num_nodes),
                              num_edges=min(ne_, self.num_edges),
                              num_graphs=self.num_graphs)
            else:
                yield collate(datas, num_nodes=self.num_nodes,
                              num_edges=self.num_edges,
                              num_graphs=self.num_graphs)


class DataListLoader:
    """Yields raw Python lists of ``Data`` — the multi-device parallel
    input format (each device gets its own sub-list, collated per shard by
    the parallel wrapper)."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator[List[Data]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        bs = self.batch_size
        for start in range(0, len(idx), bs):
            chunk = idx[start:start + bs]
            if self.drop_last and len(chunk) < bs:
                break
            yield [self.dataset[int(i)] for i in chunk]


class DenseDataLoader:
    """Stacks equal-shape dense fields (x, adj, mask, y) into leading-dim
    batches — DiffPool's input format.  Requires a ``ToDense``-style
    pre-transform so every graph has identical dense shapes."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        import jax.numpy as jnp
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        bs = self.batch_size
        for start in range(0, len(idx), bs):
            chunk = idx[start:start + bs]
            if self.drop_last and len(chunk) < bs:
                break
            datas = [self.dataset[int(i)] for i in chunk]
            keys = datas[0].keys
            batch = {}
            for key in keys:
                vals = [np.asarray(d[key]) for d in datas]
                arr = np.stack(vals, axis=0)
                if arr.dtype == np.float64:
                    arr = arr.astype(np.float32)
                if arr.dtype == np.int64:
                    arr = arr.astype(np.int32)
                batch[key] = jnp.asarray(arr)
            yield DenseBatch(batch)


class DenseBatch(dict):
    """Attribute-style access over stacked dense fields."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    @property
    def num_graphs(self):
        for v in self.values():
            return v.shape[0]
        return 0
