"""Kernel layer: TPU-native replacements for the reference's L0 native ops.

The reference sits on four CUDA wheels (torch-scatter 2.0.4, torch-sparse
0.6.1, torch-cluster 1.5.5, torch-spline-conv 1.2.0 — reference
requirement.txt:1-5).  Here the same surface is provided as:

- ``segment_*``   — XLA segment reductions (scatter_add/mean/max/min
                    equivalents; reference torch-scatter).
- ``spmm``        — gather x edge-weight x segment-reduce, the hot op under
                    every message-passing aggregation; Pallas windowed
                    one-hot kernel + XLA fallback (reference torch-sparse).
- ``sddmm``       — per-edge scores from endpoint features (GAT/AGNN/DNA
                    attention logits).
- ``segment_softmax`` — numerically stable softmax over incoming edges.
- clustering (graclus/voxel_grid/fps/radius/knn) lives in
  ``pytorch_geometric_tpu.cluster`` (host-side + device kernels;
  reference torch-cluster).
"""

from pytorch_geometric_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    scatter,
)
from pytorch_geometric_tpu.ops.spmm import (  # noqa: F401
    spmm,
    SpmmOperator,
    spmm_bi_static,
    pack_bipartite_tables,
)
from pytorch_geometric_tpu.ops.sorted_spmm import (  # noqa: F401
    SortedSpmm,
    SortedSegmentSum,
)
from pytorch_geometric_tpu.ops.hybrid_spmm import HybridSpmm  # noqa: F401
from pytorch_geometric_tpu.ops.sddmm import sddmm, edge_gather  # noqa: F401

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "scatter",
    "spmm",
    "SpmmOperator",
    "spmm_bi_static",
    "pack_bipartite_tables",
    "SortedSpmm",
    "SortedSegmentSum",
    "HybridSpmm",
    "sddmm",
    "edge_gather",
]
