"""Device-mesh helpers."""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("dp",),
              devices=None) -> Mesh:
    """Build a Mesh over available devices.

    Default: 1-D data-parallel mesh over all devices.  Multi-axis shapes
    (e.g. (dp, graph) for DP x edge-partition) reshape the device list
    row-major; on real slices, callers should order axes so the
    highest-traffic axis (halo exchange) rides contiguous ICI neighbours.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    devices = np.asarray(devices[: int(np.prod(axis_sizes))]).reshape(
        tuple(axis_sizes))
    return Mesh(devices, axis_names[: devices.ndim])
