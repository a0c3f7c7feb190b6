"""Segment softmax alias at the utils level (reference:
torch_geometric.utils.softmax, backing GAT attention)."""

from pytorch_geometric_tpu.ops.segment import segment_softmax


def softmax(src, index, num_nodes, mask=None, indices_are_sorted=False):
    return segment_softmax(src, index, num_nodes, mask=mask,
                           indices_are_sorted=indices_are_sorted)
