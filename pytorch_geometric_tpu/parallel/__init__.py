"""Parallelism: mesh helpers, data parallelism, graph partitioning.

Reference counterpart: ``torch_geometric.nn.DataParallel`` over NCCL
(reference: examples/data_parallel.py:8,37; docker/Dockerfile:16,26-31) —
the only parallelism the reference has.  Here scaling is mesh-native:
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI/DCN
(psum for gradient DP; all_to_all halo exchange for edge-partitioned
graphs in ``partition.py``).
"""

from pytorch_geometric_tpu.parallel.mesh import make_mesh  # noqa: F401
from pytorch_geometric_tpu.parallel.data_parallel import (  # noqa: F401
    stack_graphs,
    shard_data_list,
    DataParallelTrainer,
)
from pytorch_geometric_tpu.parallel.api import (  # noqa: F401
    GraphPartition,
    ShardCtx,
)
from pytorch_geometric_tpu.parallel.fast import (  # noqa: F401
    PartitionedSpmm,
)
from pytorch_geometric_tpu.parallel.models import (  # noqa: F401
    DistGAT,
    DistGCN,
    DistRGCN,
    DistSAGE,
)

__all__ = ["make_mesh", "stack_graphs", "shard_data_list",
           "DataParallelTrainer", "GraphPartition", "ShardCtx",
           "PartitionedSpmm", "DistGCN", "DistSAGE", "DistGAT",
           "DistRGCN"]
