"""networkx conversion helpers (reference: torch_geometric.utils
to_networkx/from_networkx family, used implicitly throughout the fork's
spectral toolkit which lives in networkx)."""

from typing import Optional

import networkx as nx
import numpy as np


def to_networkx(data_or_graph, node_attrs=None, edge_attrs=None,
                to_undirected: bool = False) -> nx.Graph:
    """Host Data or device Graph -> networkx (real nodes/edges only)."""
    from pytorch_geometric_tpu.data.data import Data
    from pytorch_geometric_tpu.data.graph import Graph

    if isinstance(data_or_graph, Graph):
        g = data_or_graph
        nm = np.asarray(g.real_node_mask())
        em = np.asarray(g.real_edge_mask())
        senders = np.asarray(g.senders)[em]
        receivers = np.asarray(g.receivers)[em]
        n = int(nm.sum())
        x = None if g.x is None else np.asarray(g.x)
    else:
        d: Data = data_or_graph
        senders, receivers = d.edge_index
        n = d.num_nodes
        x = d.x

    G = nx.Graph() if to_undirected else nx.DiGraph()
    G.add_nodes_from(range(n))
    if x is not None and node_attrs:
        for key in node_attrs:
            vals = x if key == "x" else getattr(data_or_graph, key, None)
            if vals is not None:
                for i in range(n):
                    G.nodes[i][key] = np.asarray(vals[i])
    G.add_edges_from(zip(senders.tolist(), receivers.tolist()))
    return G


def from_networkx(G: nx.Graph):
    """networkx -> host Data (undirected graphs get both directions)."""
    from pytorch_geometric_tpu.data.data import Data

    mapping = {n: i for i, n in enumerate(G.nodes())}
    edges = [(mapping[u], mapping[v]) for u, v in G.edges()]
    if not G.is_directed():
        edges = edges + [(v, u) for u, v in edges]
    if edges:
        ei = np.asarray(edges, dtype=np.int64).T
    else:
        ei = np.zeros((2, 0), dtype=np.int64)
    d = Data(edge_index=ei)
    d.num_nodes = G.number_of_nodes()
    return d
