"""Benchmark datasets (reference: torch_geometric.datasets surface,
SURVEY §1-L3), with deterministic synthetic fallbacks for air-gapped use."""

from pytorch_geometric_tpu.datasets.planetoid import Planetoid, CoraFull  # noqa: F401
from pytorch_geometric_tpu.datasets.synthetic import (  # noqa: F401
    synthetic_citation_graph,
    synthetic_graph_classification,
    CITATION_SHAPES,
)

__all__ = [
    "Planetoid", "CoraFull", "synthetic_citation_graph",
    "synthetic_graph_classification", "CITATION_SHAPES",
]
