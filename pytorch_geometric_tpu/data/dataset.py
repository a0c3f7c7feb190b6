"""Dataset base classes: download/process/cache pattern.

Reference counterpart: ``torch_geometric.data.Dataset`` /
``InMemoryDataset`` (reference usage: examples/mutag_gin.py:11-13 slicing
and ``shuffle()``, examples/qm9_nn_conv.py:55-57 in-place ``.data``
mutation, ``num_features`` / ``num_classes`` properties).

Storage is a plain pickle of host ``Data`` records under
``<root>/processed/``.  ``download()`` is best-effort: in air-gapped
environments datasets fall back to deterministic synthetic graphs with
the canonical shapes (see ``datasets.synthetic``) so every example and
benchmark remains runnable offline.
"""

import os
import os.path as osp
import pickle
from typing import Callable, List, Optional, Sequence, Union

import numpy as np

from pytorch_geometric_tpu.data.data import Data


def files_exist(paths: Sequence[str]) -> bool:
    return len(paths) > 0 and all(osp.exists(p) for p in paths)


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


class Dataset:
    """Abstract dataset rooted at a path, with raw/processed caching."""

    def __init__(self, root: Optional[str] = None,
                 transform: Optional[Callable] = None,
                 pre_transform: Optional[Callable] = None,
                 pre_filter: Optional[Callable] = None):
        self.root = osp.expanduser(root) if root else None
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = pre_filter
        if self.root is not None:
            self._maybe_download()
            self._maybe_process()

    # --- to override ------------------------------------------------------

    @property
    def raw_file_names(self) -> List[str]:
        raise NotImplementedError

    @property
    def processed_file_names(self) -> List[str]:
        raise NotImplementedError

    def download(self):
        raise NotImplementedError

    def process(self):
        raise NotImplementedError

    def len(self) -> int:
        raise NotImplementedError

    def get(self, idx: int) -> Data:
        raise NotImplementedError

    # --- caching skeleton -------------------------------------------------

    @property
    def raw_dir(self) -> str:
        return osp.join(self.root, "raw")

    @property
    def processed_dir(self) -> str:
        return osp.join(self.root, "processed")

    @property
    def raw_paths(self) -> List[str]:
        return [osp.join(self.raw_dir, f) for f in self.raw_file_names]

    @property
    def processed_paths(self) -> List[str]:
        return [osp.join(self.processed_dir, f)
                for f in self.processed_file_names]

    def _maybe_download(self):
        if files_exist(self.raw_paths):
            return
        makedirs(self.raw_dir)
        self.download()

    def _maybe_process(self):
        if files_exist(self.processed_paths):
            return
        makedirs(self.processed_dir)
        self.process()

    # --- access -----------------------------------------------------------

    def __len__(self) -> int:
        return self.len()

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            data = self.get(int(idx))
            if self.transform is None:
                return data
            # clone so access-time transforms never mutate the cache
            # (matches the reference's InMemoryDataset.get clone)
            return self.transform(data.clone())
        return self.index_select(idx)

    def index_select(self, idx) -> "Subset":
        if isinstance(idx, slice):
            idx = np.arange(self.len())[idx]
        elif isinstance(idx, np.ndarray) and idx.dtype == bool:
            idx = np.flatnonzero(idx)
        return Subset(self, np.asarray(idx, dtype=np.int64))

    def shuffle(self, seed: Optional[int] = None) -> "Subset":
        rng = np.random.default_rng(seed)
        perm = rng.permutation(self.len())
        return Subset(self, perm)

    @property
    def num_node_features(self) -> int:
        return self[0].num_node_features

    num_features = num_node_features

    @property
    def num_edge_features(self) -> int:
        return self[0].num_edge_features

    @property
    def num_classes(self) -> int:
        ys = []
        for i in range(self.len()):
            y = self.get(i).y
            if y is not None:
                ys.append(np.atleast_1d(y))
        if not ys:
            return 0
        y = np.concatenate(ys)
        if np.issubdtype(y.dtype, np.floating) and y.ndim > 1:
            return y.shape[-1]
        return int(y.max()) + 1

    def __repr__(self):
        return f"{self.__class__.__name__}({self.len()})"


class Subset(Dataset):
    """Index-selected view over a dataset (result of slicing/shuffle)."""

    def __init__(self, dataset: Dataset, indices: np.ndarray):
        self.dataset = dataset
        self.indices = indices
        self.root = dataset.root
        self.transform = None  # parent transform already applies in get
        self.pre_transform = dataset.pre_transform
        self.pre_filter = dataset.pre_filter

    def len(self):
        return len(self.indices)

    def get(self, idx):
        return self.dataset[int(self.indices[idx])]

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            return self.get(int(idx))
        return self.index_select(idx)

    @property
    def num_classes(self):
        return self.dataset.num_classes


class InMemoryDataset(Dataset):
    """Holds the full list of ``Data`` records in memory; processing
    pickles the list to ``processed_paths[0]``.

    Subclasses implement ``process_full() -> List[Data]`` (simpler than
    the reference's collate/slices machinery — list storage is fine at
    these corpus sizes and keeps ``.data``-style mutation trivial via
    :class:`DataView`)."""

    def __init__(self, root=None, transform=None, pre_transform=None,
                 pre_filter=None):
        self.data_list: List[Data] = []
        super().__init__(root, transform, pre_transform, pre_filter)
        if self.root is not None and not self.data_list:
            with open(self.processed_paths[0], "rb") as f:
                self.data_list = pickle.load(f)

    @property
    def processed_file_names(self):
        return ["data.pkl"]

    def process_full(self) -> List[Data]:
        raise NotImplementedError

    def process(self):
        data_list = self.process_full()
        if self.pre_filter is not None:
            data_list = [d for d in data_list if self.pre_filter(d)]
        if self.pre_transform is not None:
            data_list = [self.pre_transform(d) for d in data_list]
        self.data_list = data_list
        with open(self.processed_paths[0], "wb") as f:
            pickle.dump(data_list, f)

    def len(self):
        return len(self.data_list)

    def get(self, idx):
        return self.data_list[idx]

    @property
    def data(self) -> "DataView":
        """Column view over all graphs: ``dataset.data.y`` returns the
        concatenated field; assigning writes back through to the records
        (reference in-place mutation, examples/qm9_nn_conv.py:55-57)."""
        return DataView(self)


class DataView:
    def __init__(self, dataset: InMemoryDataset):
        object.__setattr__(self, "_ds", dataset)

    def __getattr__(self, key):
        vals = [getattr(d, key, None) for d in self._ds.data_list]
        if all(v is None for v in vals):
            raise AttributeError(key)
        axis = 1 if key in ("edge_index", "face") else 0
        return np.concatenate([np.atleast_1d(v) for v in vals], axis=axis)

    def __setattr__(self, key, value):
        ds = self._ds
        value = np.asarray(value)
        off = 0
        axis = 1 if key in ("edge_index", "face") else 0
        for d in ds.data_list:
            cur = np.atleast_1d(getattr(d, key))
            n = cur.shape[axis]
            sl = [slice(None)] * value.ndim
            sl[axis] = slice(off, off + n)
            setattr(d, key, value[tuple(sl)])
            off += n
