"""GNN-FiLM message passing (feature-wise linear modulation by target state).

``msg' = gamma_l(h_tgt) * (W_l h_src) + beta_l(h_tgt)`` applied after optional
in-degree normalisation — reference:
tf2_gnn/layers/message_passing/gnn_film.py:83-108 (FiLM modulation wraps the
GNN_Edge_MLP message, which already includes normalisation).

Both the message MLP (pointwise in source) and the FiLM parameter MLP
(pointwise in target) run densely in node space; edge space does two gathers
and a fused multiply-add.
"""
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ...data.graph_batch import GraphBatch
from ...ops.segment import gather_rows
from .base import register_message_passing_implementation
from .gnn_edge_mlp import GNN_Edge_MLP
from .typed_linear import TypedLinear


@register_message_passing_implementation
class GNN_FiLM(GNN_Edge_MLP):
    use_target_state_as_input: bool = False
    normalize_by_num_incoming: bool = False
    num_edge_MLP_hidden_layers: int = 0
    film_parameter_MLP_hidden_layers: Tuple[int, ...] = ()

    @classmethod
    def get_default_hyperparameters(cls) -> Dict[str, Any]:
        params = super().get_default_hyperparameters()
        params.update(
            {
                "use_target_state_as_input": False,
                "normalize_by_num_incoming": False,
                "num_edge_MLP_hidden_layers": 0,
                "film_parameter_MLP_hidden_layers": [],
            }
        )
        return params

    def _fused_sum_aggregate(self, node_states, batch, training):
        # FiLM messages are modulated per edge by the target state — not a
        # pure source gather, so the fused path does not apply.
        return None

    def _compute_messages_per_type(
        self, node_states: jnp.ndarray, batch: GraphBatch, training: bool
    ) -> List[jnp.ndarray]:
        messages = super()._compute_messages_per_type(node_states, batch, training)

        # FiLM parameter MLP on the *target* state, per edge type — pointwise
        # in the target node, so computed in node space and gathered.
        num_types = batch.num_edge_types
        film = node_states  # [V, D] -> [L, V, 2H]
        sizes = list(self.film_parameter_MLP_hidden_layers) + [2 * self.hidden_dim]
        num_hidden = len(sizes) - 1
        for i, size in enumerate(sizes):
            film = TypedLinear(
                num_types, film.shape[-1], size, name=f"film_mlp_layer_{i}"
            )(film)
            if i < num_hidden:
                film = jax.nn.relu(film)

        modulated = []
        for l in range(num_types):
            per_edge_film = batch.gather_target_rows(film[l], l)
            gamma = per_edge_film[:, : self.hidden_dim]
            beta = per_edge_film[:, self.hidden_dim :]
            modulated.append(gamma * messages[l] + beta)
        return modulated
