"""Pooling layer (reference: torch_geometric.nn pooling family, SURVEY §1-L4.2)."""

from pytorch_geometric_tpu.nn.pool.global_pool import (  # noqa: F401
    global_add_pool,
    global_mean_pool,
    global_max_pool,
)

__all__ = ["global_add_pool", "global_mean_pool", "global_max_pool"]
