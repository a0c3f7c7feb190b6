"""`Graph` — the device-side graph pytree.

TPU-native replacement for the reference's ``torch_geometric.data.Data`` /
``Batch`` pair (reference: examples/gcn.py:12,24,46; examples/
mutag_gin.py:7,14-15).  Differences are deliberate:

- **Pure pytree**: a frozen dataclass of jnp arrays, usable directly as a
  jit/grad/shard_map argument.  No methods mutate; use ``.replace``.
- **Static shapes**: N and E include padding; ``node_mask`` / ``edge_mask``
  mark real entries.  Padded edges point at a designated padding node so
  segment ops stay correct without branching.
- **Batching is block-diagonal**, like the reference's collation: a batch
  of graphs *is* one big Graph whose ``batch`` vector maps node -> graph id
  (reference DataLoader semantics, examples/mutag_gin.py:14-15).

Arbitrary extra per-node/graph fields (train/val/test masks, etc.) ride in
the ``extras`` dict, mirroring Data's open attribute namespace
(reference keyword iteration ``data('train_mask', ...)``,
examples/gcn.py:46).
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Graph:
    """A (possibly batched, possibly padded) graph on device."""

    senders: jnp.ndarray                      # (E,) int32 — edge_index[0]
    receivers: jnp.ndarray                    # (E,) int32 — edge_index[1]
    x: Optional[jnp.ndarray] = None           # (N, F)
    edge_attr: Optional[jnp.ndarray] = None   # (E, Fe)
    pos: Optional[jnp.ndarray] = None         # (N, D)
    y: Optional[jnp.ndarray] = None           # (N, ...) or (G, ...)
    node_mask: Optional[jnp.ndarray] = None   # (N,) bool; None = all valid
    edge_mask: Optional[jnp.ndarray] = None   # (E,) bool
    batch: Optional[jnp.ndarray] = None       # (N,) int32 graph ids
    extras: Dict[str, Any] = struct.field(default_factory=dict)
    num_graphs: int = struct.field(pytree_node=False, default=1)
    # True when edges are sorted by receiver (set by the loaders; lets
    # segment reductions use the sorted fast path).
    edges_sorted: bool = struct.field(pytree_node=False, default=False)

    # --- shape helpers (static) ------------------------------------------

    @property
    def num_nodes(self) -> int:
        """Padded node count N (static)."""
        if self.x is not None:
            return self.x.shape[0]
        if self.pos is not None:
            return self.pos.shape[0]
        if self.node_mask is not None:
            return self.node_mask.shape[0]
        if self.batch is not None:
            return self.batch.shape[0]
        return int(jnp.max(jnp.maximum(self.senders, self.receivers))) + 1

    @property
    def num_edges(self) -> int:
        """Padded edge count E (static)."""
        return self.senders.shape[0]

    @property
    def num_node_features(self) -> int:
        return 0 if self.x is None else self.x.shape[-1]

    @property
    def num_edge_features(self) -> int:
        return 0 if self.edge_attr is None else self.edge_attr.shape[-1]

    @property
    def edge_index(self):
        """(2, E) view for reference-API familiarity."""
        return jnp.stack([self.senders, self.receivers])

    def real_node_mask(self) -> jnp.ndarray:
        if self.node_mask is not None:
            return self.node_mask
        return jnp.ones((self.num_nodes,), dtype=bool)

    def real_edge_mask(self) -> jnp.ndarray:
        if self.edge_mask is not None:
            return self.edge_mask
        return jnp.ones((self.num_edges,), dtype=bool)

    def __getattr__(self, key):
        # Open attribute namespace like the reference's Data: extras are
        # reachable as graph.train_mask etc.  (Only called when normal
        # attribute lookup fails.)
        extras = object.__getattribute__(self, "extras")
        if key in extras:
            return extras[key]
        raise AttributeError(key)


def from_edge_index(edge_index, num_nodes=None, **kwargs) -> Graph:
    """Build a Graph from a (2, E) edge_index array (reference-style)."""
    edge_index = jnp.asarray(edge_index)
    g = Graph(senders=edge_index[0].astype(jnp.int32),
              receivers=edge_index[1].astype(jnp.int32), **kwargs)
    if num_nodes is not None and g.x is None and g.pos is None \
            and g.node_mask is None and g.batch is None:
        g = g.replace(node_mask=jnp.ones((num_nodes,), dtype=bool))
    return g
