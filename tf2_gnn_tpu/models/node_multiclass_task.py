"""Per-node multiclass (multi-label) task — the PPI benchmark head.

Reference: tf2_gnn/models/node_multiclass_task.py:10-72. A dense layer maps
final node states to per-node logits; loss is sigmoid cross-entropy summed
over labels and averaged per *real* node; the tracked metric is batch
micro-F1, negated so that lower is better.
"""
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph_batch import GraphBatch
from ..utils.constants import SMALL_NUMBER
from .graph_task_model import GraphTaskModel


def masked_f1_counts(logits: jnp.ndarray, labels: jnp.ndarray,
                     mask: jnp.ndarray, spmd_axis=None):
    """(TP, FP, FN) over real nodes, psum-ed over the mesh axis in SPMD."""
    # round(sigmoid(x)) == (x > 0), exactly — skip the transcendental.
    predicted = (logits > 0.0).astype(logits.dtype) * mask[:, None]
    labels = labels * mask[:, None]
    true_pos = jnp.sum(predicted * labels)
    false_pos = jnp.sum(predicted * (1.0 - labels) * mask[:, None])
    false_neg = jnp.sum((1.0 - predicted) * labels)
    if spmd_axis is not None:
        true_pos = jax.lax.psum(true_pos, spmd_axis)
        false_pos = jax.lax.psum(false_pos, spmd_axis)
        false_neg = jax.lax.psum(false_neg, spmd_axis)
    return true_pos, false_pos, false_neg


def f1_from_counts(true_pos, false_pos, false_neg):
    precision = true_pos / jnp.maximum(true_pos + false_pos, SMALL_NUMBER)
    recall = true_pos / jnp.maximum(true_pos + false_neg, SMALL_NUMBER)
    return (2.0 * precision * recall) / jnp.maximum(precision + recall, SMALL_NUMBER)


def masked_micro_f1(logits: jnp.ndarray, labels: jnp.ndarray,
                    mask: jnp.ndarray, spmd_axis=None) -> jnp.ndarray:
    """Micro-averaged F1 over real nodes (reference micro_f1,
    node_multiclass_task.py:10-23, with padding masked out)."""
    return f1_from_counts(*masked_f1_counts(logits, labels, mask, spmd_axis))


class NodeMulticlassTask(GraphTaskModel):
    num_labels: int = 121

    @classmethod
    def get_default_hyperparameters(cls, mp_style: Optional[str] = None) -> Dict[str, Any]:
        return super().get_default_hyperparameters(mp_style)

    @classmethod
    def _dataset_kwargs(cls, params: Dict[str, Any], dataset) -> Dict[str, Any]:
        if dataset is None:
            return {}
        if not hasattr(dataset, "num_node_target_labels"):
            raise ValueError(
                f"Provided dataset of type {type(dataset)} does not provide "
                "num_node_target_labels information."
            )
        return {"num_labels": dataset.num_node_target_labels}

    def compute_task_output(self, batch: GraphBatch, node_representations, training: bool):
        per_node_logits = nn.Dense(
            self.num_labels,
            use_bias=True,
            kernel_init=nn.initializers.glorot_uniform(),
            name="node_to_labels",
        )(node_representations)
        return (per_node_logits,)

    @staticmethod
    def compute_task_metrics(batch, task_output, labels):
        (per_node_logits,) = task_output
        node_labels = labels["node_labels"]
        mask = batch.node_mask  # [V]

        # Numerically-stable sigmoid BCE with logits, summed over label dims.
        x, z = per_node_logits, node_labels
        per_entry = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
        per_node = jnp.sum(per_entry, axis=-1) * mask
        loss_sum = jnp.sum(per_node)
        num_nodes = batch.num_nodes.astype(jnp.float32)
        num_graphs = batch.num_graphs
        if batch.spmd_axis is not None:
            # Node-partitioned giant graph: combine shard-local sums over ICI.
            loss_sum = jax.lax.psum(loss_sum, batch.spmd_axis)
            num_nodes = jax.lax.psum(num_nodes, batch.spmd_axis)
        loss = loss_sum / jnp.maximum(num_nodes, 1.0)

        tp, fp, fn = masked_f1_counts(per_node_logits, node_labels, mask,
                                      spmd_axis=batch.spmd_axis)
        f1 = f1_from_counts(tp, fp, fn)
        return {"loss": loss, "f1_score": f1, "num_graphs": num_graphs,
                "f1_tp": tp, "f1_fp": fp, "f1_fn": fn}

    @staticmethod
    def compute_epoch_metrics(task_results: List[Dict[str, Any]]) -> Tuple[float, str]:
        # Selection metric: unweighted mean of batch F1s (reference parity,
        # node_multiclass_task.py:70-72). Also report the exact epoch-level
        # micro-F1 from the pooled TP/FP/FN counts — batches differ in node
        # count, so the batch mean is biased by small trailing batches.
        avg_f1 = float(np.average([float(r["f1_score"]) for r in task_results]))
        tp = float(np.sum([float(r.get("f1_tp", 0.0)) for r in task_results]))
        fp = float(np.sum([float(r.get("f1_fp", 0.0)) for r in task_results]))
        fn = float(np.sum([float(r.get("f1_fn", 0.0)) for r in task_results]))
        precision = tp / max(tp + fp, SMALL_NUMBER)
        recall = tp / max(tp + fn, SMALL_NUMBER)
        exact_f1 = 2.0 * precision * recall / max(precision + recall, SMALL_NUMBER)
        return -avg_f1, f"Avg MicroF1: {avg_f1:.3f} (exact epoch MicroF1: {exact_f1:.3f})"
