"""Neural network layer: conv zoo, pooling, models, parallel wrappers."""

from pytorch_geometric_tpu.nn.message_passing import propagate  # noqa: F401
from pytorch_geometric_tpu.nn import inits  # noqa: F401
from pytorch_geometric_tpu.nn.norm import MaskedBatchNorm  # noqa: F401
from pytorch_geometric_tpu.nn.conv import *  # noqa: F401,F403
from pytorch_geometric_tpu.nn.conv import __all__ as _conv_all
from pytorch_geometric_tpu.nn.pool import *  # noqa: F401,F403
from pytorch_geometric_tpu.nn.pool import __all__ as _pool_all
from pytorch_geometric_tpu.nn.models import *  # noqa: F401,F403
from pytorch_geometric_tpu.nn.models import __all__ as _model_all

# Reference-API alias: torch_geometric.nn.DataParallel -> the shard_map
# trainer (examples/data_parallel.py:8,37).
from pytorch_geometric_tpu.parallel.data_parallel import (  # noqa: F401
    DataParallelTrainer as DataParallel,
)
from pytorch_geometric_tpu.cluster import (  # noqa: F401
    fps,
    knn,
    knn_graph,
    radius,
    voxel_grid,
)

__all__ = (["propagate", "inits", "MaskedBatchNorm", "DataParallel",
            "fps", "knn", "knn_graph", "radius", "voxel_grid"]
           + list(_conv_all) + list(_pool_all) + list(_model_all))
