"""GGNN message passing (Li et al., gated graph neural network).

``h'_v = GRU(h_v, sum_l sum_{(u,v) in A_l} W_l h_u)`` — reference:
tf2_gnn/layers/message_passing/ggnn.py:47-89 (RGCN-style messages, node update
via a shared Keras GRUCell instead of an activation; requires input dim ==
hidden_dim). The GRU is three fused MXU matmuls + VPU gates (ops/gru.py).
"""
from typing import Any, Dict, List

import jax.numpy as jnp

from ...data.graph_batch import GraphBatch
from ...ops.gru import GRUCell
from ...ops.segment import get_aggregation_function
from .base import register_message_passing_implementation
from .gnn_edge_mlp import GNN_Edge_MLP


@register_message_passing_implementation
class GGNN(GNN_Edge_MLP):
    use_target_state_as_input: bool = False
    normalize_by_num_incoming: bool = True
    num_edge_MLP_hidden_layers: int = 0

    @classmethod
    def get_default_hyperparameters(cls) -> Dict[str, Any]:
        params = super().get_default_hyperparameters()
        params.update(
            {
                "use_target_state_as_input": False,
                "normalize_by_num_incoming": True,
                "num_edge_MLP_hidden_layers": 0,
            }
        )
        return params

    # No message activation anywhere — the GRU *is* the update
    # (reference ggnn.py:70-89).
    _apply_message_activation = False

    def _post_aggregate(self, aggregated, node_states, batch, training):
        if node_states.shape[-1] != self.hidden_dim:
            raise ValueError(
                "GGNN requires node state dim == hidden_dim "
                f"({node_states.shape[-1]} != {self.hidden_dim})."
            )
        return GRUCell(self.hidden_dim, name="gru_cell")(aggregated, node_states)
