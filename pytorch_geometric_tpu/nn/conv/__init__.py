"""Convolution zoo (reference: torch_geometric.nn conv family, SURVEY §2b)."""

from pytorch_geometric_tpu.nn.conv.gcn_conv import GCNConv, gcn_norm, EdgeNorm  # noqa: F401
from pytorch_geometric_tpu.nn.conv.gat_conv import (  # noqa: F401
    GATConv,
    gat_dense_adj,
)
from pytorch_geometric_tpu.nn.conv.graph_conv import GraphConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.gin_conv import GINConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.sage_conv import SAGEConv, DenseSAGEConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.cheb_conv import ChebConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.sg_conv import SGConv, sgc_precompute  # noqa: F401
from pytorch_geometric_tpu.nn.conv.arma_conv import ARMAConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.agnn_conv import AGNNConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.nn_conv import NNConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.rgcn_conv import RGCNConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.dna_conv import DNAConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.spline_conv import (  # noqa: F401
    SplineConv,
    spline_basis,
)
from pytorch_geometric_tpu.nn.conv.point_conv import PointConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.edge_conv import EdgeConv  # noqa: F401
from pytorch_geometric_tpu.nn.conv.gcn_conv import gcn_norm_dense  # noqa: F401
from pytorch_geometric_tpu.nn.conv.rgcn_conv import rgcn_norm  # noqa: F401

__all__ = [
    "GCNConv", "gcn_norm", "gcn_norm_dense", "EdgeNorm", "GATConv",
    "GraphConv", "GINConv",
    "SAGEConv", "DenseSAGEConv", "ChebConv", "SGConv", "sgc_precompute",
    "ARMAConv", "AGNNConv", "NNConv", "RGCNConv", "rgcn_norm", "DNAConv",
    "SplineConv", "spline_basis", "PointConv", "EdgeConv",
]
