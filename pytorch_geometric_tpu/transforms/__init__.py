"""Data -> Data transforms (reference: torch_geometric.transforms surface
used by the fork, SURVEY §1-L2)."""

from pytorch_geometric_tpu.transforms.compose import Compose  # noqa: F401
from pytorch_geometric_tpu.transforms.normalize_features import (  # noqa: F401
    NormalizeFeatures,
)

__all__ = ["Compose", "NormalizeFeatures"]
