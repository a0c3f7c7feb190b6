"""Benchmark datasets (reference: torch_geometric.datasets surface,
SURVEY §1-L3), with deterministic synthetic fallbacks for air-gapped use."""

from pytorch_geometric_tpu.datasets.planetoid import Planetoid, CoraFull  # noqa: F401
from pytorch_geometric_tpu.datasets.tu_dataset import TUDataset  # noqa: F401
from pytorch_geometric_tpu.datasets.ppi import PPI  # noqa: F401
from pytorch_geometric_tpu.datasets.large_graphs import Reddit, Amazon  # noqa: F401
from pytorch_geometric_tpu.datasets.molecules import (  # noqa: F401
    QM9,
    Entities,
    MNISTSuperpixels,
)
from pytorch_geometric_tpu.datasets.meshes import FAUST, ModelNet  # noqa: F401
from pytorch_geometric_tpu.datasets.synthetic import (  # noqa: F401
    synthetic_citation_graph,
    synthetic_graph_classification,
    CITATION_SHAPES,
)

__all__ = [
    "Planetoid", "CoraFull", "TUDataset", "PPI", "Reddit", "Amazon",
    "QM9", "Entities", "MNISTSuperpixels", "FAUST", "ModelNet",
    "synthetic_citation_graph", "synthetic_graph_classification",
    "CITATION_SHAPES",
]
