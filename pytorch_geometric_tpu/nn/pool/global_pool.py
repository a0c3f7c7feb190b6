"""Global graph readouts (reference: global_add/mean/max_pool,
examples/mutag_gin.py:8,59; examples/enzymes_topk_pool.py:8,40-48).

Segment reductions over the ``batch`` vector.  Padding nodes belong to the
padding graph (last id), so real graph rows are exact; mean/max
additionally mask padded nodes for correctness when padding nodes share a
real graph id (never the case for loader-produced batches, but cheap
insurance for hand-built graphs).
"""

import jax.numpy as jnp

from pytorch_geometric_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_sum,
)


def _batch_of(graph, batch):
    if batch is not None:
        return batch
    if graph.batch is not None:
        return graph.batch
    return jnp.zeros((graph.num_nodes,), dtype=jnp.int32)


def global_add_pool(x, graph=None, batch=None, num_graphs=None):
    b = _batch_of(graph, batch)
    g = num_graphs or (graph.num_graphs if graph is not None else
                       int(b.max()) + 1)
    if graph is not None and graph.node_mask is not None:
        x = jnp.where(graph.node_mask.reshape(
            (-1,) + (1,) * (x.ndim - 1)), x, 0.0)
    return segment_sum(x, b, g)


def global_mean_pool(x, graph=None, batch=None, num_graphs=None):
    b = _batch_of(graph, batch)
    g = num_graphs or (graph.num_graphs if graph is not None else
                       int(b.max()) + 1)
    if graph is not None and graph.node_mask is not None:
        # route padded nodes to the padding graph id so counts stay exact
        b = jnp.where(graph.node_mask, b, g - 1)
    return segment_mean(x, b, g)


def global_max_pool(x, graph=None, batch=None, num_graphs=None):
    b = _batch_of(graph, batch)
    g = num_graphs or (graph.num_graphs if graph is not None else
                       int(b.max()) + 1)
    if graph is not None and graph.node_mask is not None:
        b = jnp.where(graph.node_mask, b, g - 1)
    return segment_max(x, b, g)
