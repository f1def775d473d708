"""RGIN message passing (relational GIN, per-edge-type MLP messages).

``h'_v = act(MLP_aggr(sum_l sum_{(u,v) in A_l} MLP_l(h_u)))`` — reference:
tf2_gnn/layers/message_passing/rgin.py:61-106. Because messages depend only on
the source state, the entire per-type MLP runs densely in node space (stacked
MXU matmuls), and only the gather + scatter touch edge space.
"""
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from ...data.graph_batch import GraphBatch
from ...layers.mlp import MLP
from ...ops.activations import get_activation_function
from ...ops.segment import get_aggregation_function
from .base import register_message_passing_implementation
from .gnn_edge_mlp import GNN_Edge_MLP


@register_message_passing_implementation
class RGIN(GNN_Edge_MLP):
    use_target_state_as_input: bool = False
    normalize_by_num_incoming: bool = False
    num_edge_MLP_hidden_layers: int = 1
    num_aggr_MLP_hidden_layers: Optional[int] = None

    @classmethod
    def get_default_hyperparameters(cls) -> Dict[str, Any]:
        params = super().get_default_hyperparameters()
        params.update(
            {
                "use_target_state_as_input": False,
                "num_edge_MLP_hidden_layers": 1,
                "num_aggr_MLP_hidden_layers": None,
            }
        )
        return params

    # The activation always runs after the (optional) aggregation MLP
    # (reference rgin.py:94-106); the base's before/after machinery is
    # bypassed by overriding _post_aggregate below.
    _apply_message_activation = False

    def _post_aggregate(self, aggregated, node_states, batch, training):
        activation = get_activation_function(self.message_activation_function)
        if self.num_aggr_MLP_hidden_layers is not None:
            aggregated = MLP(
                out_size=self.hidden_dim,
                hidden_layers=[self.hidden_dim] * self.num_aggr_MLP_hidden_layers,
                name="aggregation_mlp",
            )(aggregated, training=training)
        return activation(aggregated)
