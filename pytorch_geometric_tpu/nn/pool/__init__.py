"""Pooling layer (reference: torch_geometric.nn pooling family, SURVEY §1-L4.2)."""

from pytorch_geometric_tpu.nn.pool.global_pool import (  # noqa: F401
    global_add_pool,
    global_mean_pool,
    global_max_pool,
)
from pytorch_geometric_tpu.nn.pool.topk_pool import TopKPooling, topk_mask  # noqa: F401
from pytorch_geometric_tpu.nn.pool.set2set import Set2Set  # noqa: F401
from pytorch_geometric_tpu.nn.pool.diff_pool import dense_diff_pool  # noqa: F401
from pytorch_geometric_tpu.nn.pool.coarsen import (  # noqa: F401
    graclus,
    max_pool,
    avg_pool,
    max_pool_x,
    pool_graph_masked,
)

__all__ = [
    "global_add_pool", "global_mean_pool", "global_max_pool",
    "TopKPooling", "topk_mask", "Set2Set", "dense_diff_pool",
    "graclus", "max_pool", "avg_pool", "max_pool_x", "pool_graph_masked",
]
