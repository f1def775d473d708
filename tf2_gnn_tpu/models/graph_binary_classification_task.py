"""Graph binary classification (sigmoid on the regression head).

Reference: tf2_gnn/models/graph_binary_classification_task.py:11-101.
"""
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import SMALL_NUMBER
from .graph_regression_task import GraphRegressionTask


class GraphBinaryClassificationTask(GraphRegressionTask):
    def compute_task_output(self, batch, node_representations, training: bool):
        regression = super().compute_task_output(batch, node_representations, training)
        return jax.nn.sigmoid(regression)

    @staticmethod
    def compute_task_metrics(batch, task_output, labels):
        target = labels["target_value"]
        mask = batch.graph_mask
        num_graphs = jnp.maximum(batch.num_graphs.astype(jnp.float32), 1.0)
        # Keras binary_crossentropy on probabilities, clipped for stability.
        probs = jnp.clip(task_output, SMALL_NUMBER, 1.0 - SMALL_NUMBER)
        per_graph_ce = -(target * jnp.log(probs) + (1.0 - target) * jnp.log(1.0 - probs))
        ce = jnp.sum(per_graph_ce * mask) / num_graphs
        num_correct = jnp.sum((jnp.round(task_output) == target) * mask)
        return {
            "loss": ce,
            "batch_acc": num_correct / num_graphs,
            "num_correct": num_correct,
            "num_graphs": num_graphs,
        }

    @staticmethod
    def compute_epoch_metrics(task_results: List[Dict[str, Any]]) -> Tuple[float, str]:
        total_graphs = sum(float(r["num_graphs"]) for r in task_results)
        total_correct = sum(float(r["num_correct"]) for r in task_results)
        acc = total_correct / total_graphs
        return -acc, f"Accuracy = {acc:.3f}"

    EVAL_KIND = "binary_classification"
