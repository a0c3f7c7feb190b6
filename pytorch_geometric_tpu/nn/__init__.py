"""Neural network layer: conv zoo, pooling, models, parallel wrappers."""

from pytorch_geometric_tpu.nn.message_passing import propagate  # noqa: F401
from pytorch_geometric_tpu.nn import inits  # noqa: F401
from pytorch_geometric_tpu.nn.conv import *  # noqa: F401,F403
from pytorch_geometric_tpu.nn.conv import __all__ as _conv_all

__all__ = ["propagate", "inits"] + list(_conv_all)
