"""Nodes-to-graph readout layers.

Re-implements the reference's ``WeightedSumGraphRepresentation`` and
``WASGraphRepresentation`` (tf2_gnn/layers/nodes_to_graph_representation.py:
51-314) on padded batches: per-graph segment ops use the *static* padded graph
count, and padded nodes land in the reserved pad-graph slot so real graphs are
unaffected.
"""
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import get_activation_function
from ..ops.segment import segment_mean, segment_softmax, segment_sum
from .mlp import MLP


class WeightedSumGraphRepresentation(nn.Module):
    """Multi-head weighted sum of transformed node representations per graph.

    Weighting modes (reference nodes_to_graph_representation.py:170-227):
    ``sigmoid`` (per-node gate), ``softmax`` (per-graph normalised), ``none``
    (weight 1, plain segment-sum), ``average`` (segment-mean).
    """

    graph_representation_size: int
    num_heads: int
    weighting_fun: str = "softmax"
    scoring_mlp_layers: Union[int, Tuple[int, ...]] = (128,)
    scoring_mlp_activation_fun: str = "relu"
    scoring_mlp_use_biases: bool = False
    scoring_mlp_dropout_rate: float = 0.2
    transformation_mlp_layers: Union[int, Tuple[int, ...]] = (128,)
    transformation_mlp_activation_fun: str = "relu"
    transformation_mlp_use_biases: bool = False
    transformation_mlp_dropout_rate: float = 0.2
    transformation_mlp_result_lower_bound: Optional[float] = None
    transformation_mlp_result_upper_bound: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        node_embeddings: jnp.ndarray,  # [V, VD]
        node_to_graph: jnp.ndarray,  # [V]
        num_graphs: int,  # static padded graph count
        training: bool = False,
        spmd_axis=None,  # mesh axis when nodes are partitioned (parallel/spmd.py)
    ) -> jnp.ndarray:  # [G, GD] (replicated across the axis in SPMD mode)
        weighting = self.weighting_fun.lower()
        if weighting not in ("none", "average", "softmax", "sigmoid"):
            raise ValueError(f"Unknown weighting function {self.weighting_fun}.")
        if self.graph_representation_size % self.num_heads != 0:
            raise ValueError(
                f"Number of heads {self.num_heads} must divide representation "
                f"size {self.graph_representation_size}."
            )

        # (1) per-node/head weights
        weights = None
        if weighting in ("softmax", "sigmoid"):
            scores = MLP(
                out_size=self.num_heads,
                hidden_layers=self.scoring_mlp_layers,
                use_biases=self.scoring_mlp_use_biases,
                activation=self.scoring_mlp_activation_fun,
                dropout_rate=self.scoring_mlp_dropout_rate,
                name="scoring_mlp",
            )(node_embeddings, training=training)  # [V, K]
            if weighting == "sigmoid":
                weights = jax.nn.sigmoid(scores)
            else:
                weights = segment_softmax(scores, node_to_graph, num_graphs,
                                          spmd_axis=spmd_axis)

        # (2) per-node/head representations
        transformation_act = get_activation_function(
            self.transformation_mlp_activation_fun
        )
        node_reprs = transformation_act(
            MLP(
                out_size=self.graph_representation_size,
                hidden_layers=self.transformation_mlp_layers,
                use_biases=self.transformation_mlp_use_biases,
                activation=self.transformation_mlp_activation_fun,
                dropout_rate=self.transformation_mlp_dropout_rate,
                name="transformation_mlp",
            )(node_embeddings, training=training)
        )  # [V, GD]
        if self.transformation_mlp_result_lower_bound is not None:
            node_reprs = jnp.maximum(
                node_reprs, self.transformation_mlp_result_lower_bound
            )
        if self.transformation_mlp_result_upper_bound is not None:
            node_reprs = jnp.minimum(
                node_reprs, self.transformation_mlp_result_upper_bound
            )

        # (3) weight + aggregate by graph
        if weighting == "none":
            return segment_sum(node_reprs, node_to_graph, num_graphs,
                               spmd_axis=spmd_axis)
        if weighting == "average":
            return segment_mean(node_reprs, node_to_graph, num_graphs,
                                spmd_axis=spmd_axis)

        head_dim = self.graph_representation_size // self.num_heads
        weighted = weights[:, :, None] * node_reprs.reshape(
            -1, self.num_heads, head_dim
        )  # [V, K, GD/K]
        return segment_sum(
            weighted.reshape(-1, self.graph_representation_size),
            node_to_graph,
            num_graphs,
            spmd_axis=spmd_axis,
        )


class WASGraphRepresentation(nn.Module):
    """Weighted-Average-and-Sum readout: concat(softmax-avg readout, sigmoid-sum
    readout) projected back to size (reference
    nodes_to_graph_representation.py:232-314)."""

    graph_representation_size: int = 128
    num_heads: int = 8
    pooling_mlp_layers: Tuple[int, ...] = (128, 128)
    pooling_mlp_activation_fun: str = "elu"
    pooling_mlp_use_biases: bool = True
    pooling_mlp_dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        node_embeddings: jnp.ndarray,
        node_to_graph: jnp.ndarray,
        num_graphs: int,
        training: bool = False,
        spmd_axis=None,
    ) -> jnp.ndarray:
        common = dict(
            graph_representation_size=self.graph_representation_size,
            num_heads=self.num_heads,
            scoring_mlp_layers=self.pooling_mlp_layers,
            scoring_mlp_dropout_rate=self.pooling_mlp_dropout_rate,
            scoring_mlp_use_biases=self.pooling_mlp_use_biases,
            scoring_mlp_activation_fun=self.pooling_mlp_activation_fun,
            transformation_mlp_layers=self.pooling_mlp_layers,
            transformation_mlp_dropout_rate=self.pooling_mlp_dropout_rate,
            transformation_mlp_use_biases=self.pooling_mlp_use_biases,
            transformation_mlp_activation_fun=self.pooling_mlp_activation_fun,
        )
        avg_repr = WeightedSumGraphRepresentation(
            weighting_fun="softmax", name="weighted_avg", **common
        )(node_embeddings, node_to_graph, num_graphs, training, spmd_axis)
        sum_repr = WeightedSumGraphRepresentation(
            weighting_fun="sigmoid", name="weighted_sum", **common
        )(node_embeddings, node_to_graph, num_graphs, training, spmd_axis)
        return nn.Dense(
            self.graph_representation_size,
            use_bias=False,
            kernel_init=nn.initializers.glorot_uniform(),
            name="out_projection",
        )(jnp.concatenate([avg_repr, sum_repr], axis=-1))
