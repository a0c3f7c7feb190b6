"""Graph utilities (reference: torch_geometric.utils surface, SURVEY §1-L5)."""

from pytorch_geometric_tpu.utils.degree import degree  # noqa: F401
from pytorch_geometric_tpu.utils.loop import (  # noqa: F401
    add_self_loops,
    remove_self_loops,
    contains_self_loops,
)
from pytorch_geometric_tpu.utils.normalized_cut import normalized_cut  # noqa: F401
from pytorch_geometric_tpu.utils.softmax import softmax  # noqa: F401
from pytorch_geometric_tpu.utils.convert import (  # noqa: F401
    to_dense_adj,
    to_dense_batch,
)
from pytorch_geometric_tpu.utils.undirected import (  # noqa: F401
    to_undirected,
    is_undirected,
)
from pytorch_geometric_tpu.utils.repeat import repeat  # noqa: F401
from pytorch_geometric_tpu.utils.networkx_convert import (  # noqa: F401
    to_networkx,
    from_networkx,
)

__all__ = [
    "degree", "add_self_loops", "remove_self_loops", "contains_self_loops",
    "normalized_cut", "softmax", "to_dense_adj", "to_dense_batch",
    "to_undirected", "is_undirected", "repeat", "to_networkx",
    "from_networkx",
]
