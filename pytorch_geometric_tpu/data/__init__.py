"""Graph data core: device Graph pytree, host Data records, loaders."""

from pytorch_geometric_tpu.data.graph import Graph, from_edge_index  # noqa: F401
from pytorch_geometric_tpu.data.data import Data  # noqa: F401
from pytorch_geometric_tpu.data.batch import (  # noqa: F401
    collate,
    from_data,
    bucket_size,
)
from pytorch_geometric_tpu.data.loader import (  # noqa: F401
    DataLoader,
    DataListLoader,
    DenseDataLoader,
    DenseBatch,
)
from pytorch_geometric_tpu.data.dataset import (  # noqa: F401
    Dataset,
    InMemoryDataset,
    Subset,
)

# Batch is an alias: a batched Graph *is* a Graph (block-diagonal), exactly
# like the reference where Batch subclasses Data.
Batch = Graph

__all__ = [
    "Graph", "Batch", "Data", "from_edge_index", "collate", "from_data",
    "bucket_size", "DataLoader", "DataListLoader", "DenseDataLoader",
    "DenseBatch", "Dataset", "InMemoryDataset", "Subset",
]
