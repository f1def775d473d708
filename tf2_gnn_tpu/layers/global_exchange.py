"""Graph-global information exchange layers.

Reference: tf2_gnn/layers/graph_global_exchange.py:20-183. A weighted-sum
readout computes a per-graph summary, which is broadcast back to nodes
(gather over node_to_graph — dense scatter-add gradient, cf.
utils/gather_dense_gradient.py:10) with dropout, then combined with the node
state via Mean / GRU / MLP.
"""
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.gru import GRUCell
from ..ops.segment import gather_rows
from .mlp import MLP
from .readout import WeightedSumGraphRepresentation


class GraphGlobalExchange(nn.Module):
    """Base class: computes dropout(broadcast(readout(nodes))) per node."""

    hidden_dim: int
    weighting_fun: str = "softmax"
    num_heads: int = 4
    dropout_rate: float = 0.0

    def _per_node_graph_representations(
        self,
        node_embeddings: jnp.ndarray,
        node_to_graph: jnp.ndarray,
        num_graphs: int,
        training: bool,
        spmd_axis=None,
    ) -> jnp.ndarray:
        graph_reprs = WeightedSumGraphRepresentation(
            graph_representation_size=self.hidden_dim,
            num_heads=self.num_heads,
            weighting_fun=self.weighting_fun,
            scoring_mlp_layers=(self.hidden_dim,),
            name="node_to_graph_representation",
        )(node_embeddings, node_to_graph, num_graphs, training, spmd_axis)  # [G, H]
        per_node = gather_rows(graph_reprs, node_to_graph)  # [V, H]
        if training and self.dropout_rate > 0.0:
            per_node = nn.Dropout(rate=self.dropout_rate, deterministic=False)(per_node)
        return per_node


class GraphGlobalMeanExchange(GraphGlobalExchange):
    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, num_graphs, training=False,
                 spmd_axis=None):
        per_node = self._per_node_graph_representations(
            node_embeddings, node_to_graph, num_graphs, training, spmd_axis
        )
        return (node_embeddings + per_node) / 2.0


class GraphGlobalGRUExchange(GraphGlobalExchange):
    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, num_graphs, training=False,
                 spmd_axis=None):
        per_node = self._per_node_graph_representations(
            node_embeddings, node_to_graph, num_graphs, training, spmd_axis
        )
        # Graph representation is the GRU *input*, node state the GRU *state*
        # (reference graph_global_exchange.py:148-155).
        return GRUCell(self.hidden_dim, name="gru_cell")(per_node, node_embeddings)


class GraphGlobalMLPExchange(GraphGlobalExchange):
    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, num_graphs, training=False,
                 spmd_axis=None):
        per_node = self._per_node_graph_representations(
            node_embeddings, node_to_graph, num_graphs, training, spmd_axis
        )
        return MLP(out_size=self.hidden_dim, name="combine_mlp")(
            jnp.concatenate([per_node, node_embeddings], axis=-1), training=training
        )


GLOBAL_EXCHANGE_MODES = {
    "mean": GraphGlobalMeanExchange,
    "gru": GraphGlobalGRUExchange,
    "mlp": GraphGlobalMLPExchange,
}


def get_global_exchange_class(mode: str):
    cls = GLOBAL_EXCHANGE_MODES.get(mode.lower())
    if cls is None:
        raise ValueError(
            f"Unknown global_exchange_mode {mode} - has to be one of "
            f"{sorted(GLOBAL_EXCHANGE_MODES)}!"
        )
    return cls
