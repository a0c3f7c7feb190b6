"""Data -> Data transforms (reference: torch_geometric.transforms surface
used by the fork, SURVEY §1-L2)."""

from pytorch_geometric_tpu.transforms.compose import Compose  # noqa: F401
from pytorch_geometric_tpu.transforms.normalize_features import (  # noqa: F401
    NormalizeFeatures,
)
from pytorch_geometric_tpu.transforms.geometry import (  # noqa: F401
    Cartesian,
    Distance,
    Polar,
    TargetIndegree,
)
from pytorch_geometric_tpu.transforms.points import (  # noqa: F401
    Center,
    FaceToEdge,
    NormalizeScale,
    RandomTranslate,
    SamplePoints,
)
from pytorch_geometric_tpu.transforms.structure import (  # noqa: F401
    AddSelfLoops,
    Constant,
    OneHotDegree,
    ToDense,
)

__all__ = [
    "Compose", "NormalizeFeatures", "Cartesian", "Distance", "Polar",
    "TargetIndegree", "Center", "FaceToEdge", "NormalizeScale",
    "RandomTranslate", "SamplePoints", "AddSelfLoops", "Constant",
    "OneHotDegree", "ToDense",
]
