"""RGCN message passing (Schlichtkrull et al.).

``h'_v = act(sum_l sum_{(u,v) in A_l} 1/c_{v,l} * W_l h_u)`` — the reference
implements this as GNN_Edge_MLP with a 0-hidden-layer MLP on the source state
and in-degree normalisation (tf2_gnn/layers/message_passing/rgcn.py:50-59).
On TPU the per-type W_l collapse to one stacked [L, D, H] MXU einsum in node
space (see gnn_edge_mlp.py).
"""
from typing import Any, Dict

from .base import register_message_passing_implementation
from .gnn_edge_mlp import GNN_Edge_MLP


@register_message_passing_implementation
class RGCN(GNN_Edge_MLP):
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
