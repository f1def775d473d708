"""QM9 molecular property regression with a gated per-node readout.

Reference: tf2_gnn/models/qm9_regression.py:13-154. Per node:
``sigmoid(gate_MLP(initial || final)) * transform_MLP(final)``, summed per
graph; MSE loss; epoch MAE is additionally reported as a ratio against the 13
per-task "chemical accuracy" normalising constants.
"""
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.graph_batch import GraphBatch
from ..layers.mlp import MLP
from ..ops.segment import segment_sum
from .graph_regression_task import GraphRegressionTask
from .graph_task_model import GraphTaskModel

# Dataset-generation normalisation constants (reference qm9_regression.py:13-27).
CHEMICAL_ACC_NORMALISING_FACTORS = (
    0.066513725,
    0.012235489,
    0.071939046,
    0.033730778,
    0.033486113,
    0.004278493,
    0.001330901,
    0.004165489,
    0.004128926,
    0.00409976,
    0.004527465,
    0.012292586,
    0.037467458,
)


class QM9RegressionTask(GraphTaskModel):
    use_intermediate_gnn_results: bool = False
    out_layer_dropout_keep_prob: float = 1.0
    task_id: int = 0

    @classmethod
    def get_default_hyperparameters(cls, mp_style: Optional[str] = None) -> Dict[str, Any]:
        params = super().get_default_hyperparameters(mp_style)
        params.update(
            {
                "use_intermediate_gnn_results": False,
                "out_layer_dropout_keep_prob": 1.0,
            }
        )
        return params

    @classmethod
    def _dataset_kwargs(cls, params: Dict[str, Any], dataset) -> Dict[str, Any]:
        if dataset is None:
            return {}
        return {"task_id": int(dataset.params.get("task_id", 0))}

    def compute_task_output(self, batch: GraphBatch, node_representations, training: bool):
        if self.use_intermediate_gnn_results:
            node_representations, _ = node_representations

        per_node_output = MLP(
            out_size=1,
            hidden_layers=(),
            use_biases=True,
            dropout_rate=self.out_layer_dropout_keep_prob,
            name="regression_transform",
        )(node_representations, training=training)  # [V, 1]

        per_node_weight = MLP(
            out_size=1,
            hidden_layers=(),
            use_biases=True,
            dropout_rate=self.out_layer_dropout_keep_prob,
            name="regression_gate",
        )(
            jnp.concatenate([batch.node_features, node_representations], axis=-1),
            training=training,
        )  # [V, 1]

        per_node_weighted = jnp.squeeze(
            jax.nn.sigmoid(per_node_weight) * per_node_output, axis=-1
        )
        # Pad nodes scatter only into the pad-graph slot, masked in the loss.
        return segment_sum(
            per_node_weighted, batch.node_to_graph, batch.num_graphs_padded,
            spmd_axis=batch.spmd_axis,
        )  # [G]

    compute_task_metrics = staticmethod(GraphRegressionTask.compute_task_metrics)

    @staticmethod
    def compute_epoch_metrics(task_results: List[Dict[str, Any]]) -> Tuple[float, str]:
        total_graphs = sum(float(r["num_graphs"]) for r in task_results)
        total_abs = sum(float(r["batch_absolute_error"]) for r in task_results)
        total_sq = sum(float(r["batch_squared_error"]) for r in task_results)
        mse, mae = total_sq / total_graphs, total_abs / total_graphs
        # The per-instance task id isn't available in a staticmethod; report
        # ratios for all tasks would be noise, so default to task 0 unless the
        # caller uses compute_epoch_metrics_for_task.
        return mae, f" MSE = {mse:.3f} | MAE = {mae:.3f}"

    @classmethod
    def make_epoch_metrics_fn(cls, task_id: int):
        """Epoch metric closure including the chemical-accuracy error ratio
        for the configured QM9 property (reference qm9_regression.py:927-949)."""

        def fn(task_results: List[Dict[str, Any]]) -> Tuple[float, str]:
            total_graphs = sum(float(r["num_graphs"]) for r in task_results)
            total_abs = sum(float(r["batch_absolute_error"]) for r in task_results)
            total_sq = sum(float(r["batch_squared_error"]) for r in task_results)
            mse, mae = total_sq / total_graphs, total_abs / total_graphs
            ratio = mae / CHEMICAL_ACC_NORMALISING_FACTORS[task_id]
            return mae, (
                f"Task {task_id} | MSE = {mse:.3f} | MAE = {mae:.3f} | "
                f"Error Ratio: {ratio:.3f}"
            )

        return fn

    EVAL_KIND = "regression"
