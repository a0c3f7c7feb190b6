"""Train/val/test index sampling.

Reference counterpart: DataSampler.py (16 LoC) — SubsetRandomSampler
split over a dataset by two fractions.
"""

from typing import Tuple

import numpy as np


def data_sampler(dataset_len: int, train_frac: float = 0.8,
                 val_frac: float = 0.1, seed: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shuffled (train_idx, val_idx, test_idx) index split."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(dataset_len)
    n_train = int(train_frac * dataset_len)
    n_val = int(val_frac * dataset_len)
    return (perm[:n_train], perm[n_train:n_train + n_val],
            perm[n_train + n_val:])
