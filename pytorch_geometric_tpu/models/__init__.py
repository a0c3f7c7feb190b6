"""Model assemblies mirroring the reference's example networks."""

from pytorch_geometric_tpu.models.citation import GCN, create_gcn_train_step  # noqa: F401

__all__ = ["GCN", "create_gcn_train_step"]
