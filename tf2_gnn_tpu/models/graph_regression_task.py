"""Graph-level regression task.

Reference: tf2_gnn/models/graph_regression_task.py:18-203. Node representations
are the concat of raw input features and all intermediate GNN layer outputs
(skipping the initial projection) when ``use_intermediate_gnn_results`` is on
(the default for this task); two parallel weighted-sum readouts (softmax-avg +
sigmoid-sum, ELU MLPs) are concatenated and fed to a regression MLP.
"""
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.graph_batch import GraphBatch
from ..layers.mlp import MLP
from ..layers.readout import WeightedSumGraphRepresentation
from .graph_task_model import GraphTaskModel


class GraphRegressionTask(GraphTaskModel):
    use_intermediate_gnn_results: bool = True
    graph_aggregation_output_size: int = 32
    graph_aggregation_num_heads: int = 4
    graph_aggregation_layers: Tuple[int, ...] = (32, 32)
    graph_aggregation_dropout_rate: float = 0.1
    regression_mlp_layers: Tuple[int, ...] = (64, 32)
    regression_mlp_dropout: float = 0.1

    @classmethod
    def get_default_hyperparameters(cls, mp_style: Optional[str] = None) -> Dict[str, Any]:
        params = super().get_default_hyperparameters(mp_style)
        params.update(
            {
                "use_intermediate_gnn_results": True,
                "graph_aggregation_output_size": 32,
                "graph_aggregation_num_heads": 4,
                "graph_aggregation_layers": [32, 32],
                "graph_aggregation_dropout_rate": 0.1,
                "regression_mlp_layers": [64, 32],
                "regression_mlp_dropout": 0.1,
            }
        )
        return params

    def _node_representations_for_readout(
        self, batch: GraphBatch, node_representations
    ) -> jnp.ndarray:
        if self.use_intermediate_gnn_results:
            _, intermediates = node_representations
            # Skip intermediates[0] (output of the initial projection) —
            # reference graph_regression_task.py:607-615.
            return jnp.concatenate(
                (batch.node_features,) + tuple(intermediates[1:]), axis=-1
            )
        return jnp.concatenate([batch.node_features, node_representations], axis=-1)

    def compute_task_output(self, batch: GraphBatch, node_representations, training: bool):
        node_reprs = self._node_representations_for_readout(batch, node_representations)
        common = dict(
            graph_representation_size=self.graph_aggregation_output_size,
            num_heads=self.graph_aggregation_num_heads,
            scoring_mlp_layers=self.graph_aggregation_layers,
            scoring_mlp_dropout_rate=self.graph_aggregation_dropout_rate,
            scoring_mlp_activation_fun="elu",
            transformation_mlp_layers=self.graph_aggregation_layers,
            transformation_mlp_dropout_rate=self.graph_aggregation_dropout_rate,
            transformation_mlp_activation_fun="elu",
        )
        weighted_avg = WeightedSumGraphRepresentation(
            weighting_fun="softmax", name="weighted_avg_readout", **common
        )(node_reprs, batch.node_to_graph, batch.num_graphs_padded, training,
          batch.spmd_axis)
        weighted_sum = WeightedSumGraphRepresentation(
            weighting_fun="sigmoid", name="weighted_sum_readout", **common
        )(node_reprs, batch.node_to_graph, batch.num_graphs_padded, training,
          batch.spmd_axis)

        graph_reprs = jnp.concatenate([weighted_avg, weighted_sum], axis=-1)
        per_graph = MLP(
            out_size=1,
            hidden_layers=self.regression_mlp_layers,
            use_biases=True,
            activation="relu",
            dropout_rate=self.regression_mlp_dropout,
            name="regression_mlp",
        )(graph_reprs, training=training)
        return jnp.squeeze(per_graph, axis=-1)  # [G]

    @staticmethod
    def compute_task_metrics(batch, task_output, labels):
        target = labels["target_value"]
        mask = batch.graph_mask
        num_graphs = jnp.maximum(batch.num_graphs.astype(jnp.float32), 1.0)
        err = (task_output - target) * mask
        mse = jnp.sum(err * err) / num_graphs
        mae = jnp.sum(jnp.abs(err)) / num_graphs
        return {
            "loss": mse,
            "batch_squared_error": mse * num_graphs,
            "batch_absolute_error": mae * num_graphs,
            "num_graphs": num_graphs,
        }

    @staticmethod
    def compute_epoch_metrics(task_results: List[Dict[str, Any]]) -> Tuple[float, str]:
        total_graphs = sum(float(r["num_graphs"]) for r in task_results)
        total_abs = sum(float(r["batch_absolute_error"]) for r in task_results)
        total_sq = sum(float(r["batch_squared_error"]) for r in task_results)
        mse, mae = total_sq / total_graphs, total_abs / total_graphs
        return mae, f" MSE = {mse:.3f} | MAE = {mae:.3f}"

    # sklearn-based detailed evaluation lives in harness.evaluation
    EVAL_KIND = "regression"
