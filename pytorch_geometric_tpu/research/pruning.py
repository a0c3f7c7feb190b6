"""SVD-based width pruning.

Reference counterpart: ConvexPruning.py — ``ContractionLayerCoefficients``
(:106-114, random contracted widths), ``FindCutoffPoint`` (:117-125,
singular-value gap cutoff), ``RetainNetworkSize`` (:343-360, per-layer
torch.svd -> new widths).  jnp.linalg.svd replaces torch.svd; params are
pytrees.
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def contraction_layer_coefficients(num_features: int, num_layers: int,
                                   alpha: float, seed: int = 0
                                   ) -> List[int]:
    """Randomly contracted layer widths: each layer's width uniform in
    [alpha * prev, prev) (reference :106-114)."""
    rng = np.random.default_rng(seed)
    widths = []
    prev = int(rng.integers(max(int(num_features * alpha), 1),
                            max(num_features, 2)))
    for _ in range(num_layers):
        new = int(rng.integers(max(int(prev * alpha), 1), max(prev, 2)))
        widths.append(new)
        prev = new
    return widths


def find_cutoff_point(diag_values: np.ndarray, con_coeff: float) -> int:
    """Last index i+1 where sigma_i > con_coeff * sigma_{i+1}; full rank
    if no such gap (reference :117-125 — reproduced exactly, including
    its quirk: for descending singular values the condition holds at
    every index when con_coeff <= 1, so meaningful width contraction
    requires con_coeff > 1, i.e. a real spectral gap)."""
    diag_values = np.asarray(diag_values)
    cutoff = None
    for i in range(diag_values.shape[0] - 1):
        if diag_values[i] > diag_values[i + 1] * con_coeff:
            cutoff = i + 1
    return cutoff if cutoff is not None else int(diag_values.shape[0])


def retain_network_size(params, con_coeff: float,
                        name_filter: str = "weight") -> List[int]:
    """Per-layer SVD width cutoffs over a param pytree (reference
    :343-360).  Returns new widths in traversal order of 2-D weights."""
    out = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path).lower()
        arr = jnp.asarray(leaf)
        if arr.ndim == 3 and arr.shape[0] == 1:
            arr = arr[0]
        if arr.ndim != 2 or name_filter not in name:
            continue
        # host numpy SVD: this is a once-per-phase O(n^3) op on a
        # ~1.4k matrix, and XLA's SVD routine crashes the remote v5e
        # worker process (measured round 4 — the whole pipeline died
        # fetching its result).  Fetch the params and decompose on CPU.
        d = np.linalg.svd(np.asarray(arr), compute_uv=False)
        out.append(find_cutoff_point(d, con_coeff))
    return out
