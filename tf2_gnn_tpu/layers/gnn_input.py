"""GNNInput — the reference's library-embedding entry point.

Reference: tf2_gnn/layers/gnn.py:21-30 exposes ``GNN(params)(GNNInput(...))``
for users embedding the encoder in their own models. The TPU-native encoder
consumes padded ``GraphBatch``es; this module provides the same ergonomic
surface: build a ``GNNInput`` from ragged arrays and convert it with
``batch_from_gnn_input`` (budgets auto-derived unless pinned).
"""
from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..data.graph_batch import GraphBatch, PaddingConfig, pad_batch_arrays


class GNNInput(NamedTuple):
    """Ragged GNN encoder input, mirroring the reference's NamedTuple.

    * ``node_features``: float [V, D]
    * ``adjacency_lists``: one int [E_l, 2] array per edge type (row = (u, v),
      messages flow u -> v)
    * ``node_to_graph_map``: int [V]
    * ``num_graphs``: int
    """

    node_features: np.ndarray
    adjacency_lists: Sequence[np.ndarray]
    node_to_graph_map: np.ndarray
    num_graphs: int


def batch_from_gnn_input(
    gnn_input: GNNInput,
    config: Optional[PaddingConfig] = None,
    node_alignment: int = 64,
    edge_alignment: int = 64,
) -> GraphBatch:
    """Pad a ragged ``GNNInput`` into a static-shape ``GraphBatch``.

    Without an explicit ``config`` the budgets are derived from this input
    (aligned up); pin a config to share one XLA program across many inputs.
    """
    node_features = np.asarray(gnn_input.node_features, dtype=np.float32)
    adjacency = [
        np.asarray(a, dtype=np.int32).reshape(-1, 2)
        for a in gnn_input.adjacency_lists
    ]
    if config is None:
        def round_up(x, m):
            return int(-(-max(x, 1) // m) * m)

        config = PaddingConfig(
            num_nodes=round_up(node_features.shape[0] + 1, node_alignment),
            num_graphs=int(gnn_input.num_graphs) + 1,
            edge_budgets=tuple(
                round_up(a.shape[0], edge_alignment) for a in adjacency
            ),
        )
    return pad_batch_arrays(
        node_features=node_features,
        adjacency_lists=adjacency,
        node_to_graph=np.asarray(gnn_input.node_to_graph_map, dtype=np.int32),
        num_graphs=int(gnn_input.num_graphs),
        config=config,
    )
