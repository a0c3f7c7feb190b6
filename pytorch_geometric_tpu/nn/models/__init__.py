"""Model wrappers (reference: torch_geometric.nn models, SURVEY §1-L4.3)."""

from pytorch_geometric_tpu.nn.models.autoencoder import (  # noqa: F401
    GAE,
    VGAE,
    InnerProductDecoder,
    split_edges,
    negative_sampling,
)
from pytorch_geometric_tpu.nn.models.infomax import DeepGraphInfomax  # noqa: F401

__all__ = ["GAE", "VGAE", "InnerProductDecoder", "split_edges",
           "negative_sampling", "DeepGraphInfomax"]
