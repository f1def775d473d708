"""Abstract task model: GNN encoder + task head + pure metric functions.

Functional re-design of the reference's ``GraphTaskModel``
(tf2_gnn/models/graph_task_model.py:14-420). The Keras-model-with-optimizer
becomes three cleanly separated pieces:

* a flax module producing task outputs from a padded ``GraphBatch``
  (this file + task subclasses),
* pure jit-able per-batch metric functions (``compute_task_metrics``),
* host-side epoch reductions (``compute_epoch_metrics``).

Optimizer construction / gradient clipping / the train loop live in
``tf2_gnn_tpu.harness.training`` (optax-based).

Hyperparameter convention matches the reference: GNN hypers are carried with a
``gnn_`` prefix in the flat task-model dict and stripped when instantiating
the encoder (reference graph_task_model.py:94-97).
"""
import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph_batch import GraphBatch
from ..layers.gnn import GNN, _hashable


class GraphTaskModel(nn.Module):
    """Base flax module: encode with a GNN, then compute a task output."""

    gnn_hypers: Tuple[Tuple[str, Any], ...] = ()
    use_intermediate_gnn_results: bool = False

    # ---------------- hyperparameter plumbing ----------------
    @classmethod
    def get_default_hyperparameters(cls, mp_style: Optional[str] = None) -> Dict[str, Any]:
        params = {
            f"gnn_{name}": value
            for name, value in GNN.get_default_hyperparameters(mp_style).items()
        }
        params.update(
            {
                "optimizer": "Adam",  # One of "SGD", "RMSProp", "Adam"
                "learning_rate": 0.001,
                "learning_rate_warmup_steps": None,
                "learning_rate_decay_steps": None,
                "momentum": 0.85,
                "rmsprop_rho": 0.98,
                "gradient_clip_value": None,
                "gradient_clip_norm": None,
                "gradient_clip_global_norm": None,
                "use_intermediate_gnn_results": False,
            }
        )
        return params

    @classmethod
    def from_params(cls, params: Dict[str, Any], dataset=None) -> "GraphTaskModel":
        """Build from the flat task-model hyperparameter dict.

        ``dataset`` provides task-specific dimensions (e.g. label counts);
        subclasses override ``_dataset_kwargs`` to pull what they need.
        """
        gnn_params = {
            key[len("gnn_"):]: value
            for key, value in params.items()
            if key.startswith("gnn_")
        }
        gnn_hypers = tuple(sorted((k, _hashable(v)) for k, v in gnn_params.items()))

        field_names = {f.name for f in dataclasses.fields(cls) if f.init}
        field_names -= {"parent", "name", "gnn_hypers"}
        kwargs = {
            k: _hashable(v) for k, v in params.items() if k in field_names
        }
        kwargs.update(cls._dataset_kwargs(params, dataset))
        return cls(gnn_hypers=gnn_hypers, **kwargs)

    @classmethod
    def _dataset_kwargs(cls, params: Dict[str, Any], dataset) -> Dict[str, Any]:
        return {}

    # ---------------- forward pass ----------------
    def compute_initial_node_features(
        self, batch: GraphBatch, training: bool
    ) -> jnp.ndarray:
        return batch.node_features

    def compute_task_output(self, batch: GraphBatch, node_representations, training: bool):
        """Subclasses map final node representations to task outputs.

        ``node_representations`` is the final [V, H] array, or a pair
        (final, tuple-of-all-representations) when
        ``use_intermediate_gnn_results`` is set (reference
        graph_task_model.py:131-156).
        """
        raise NotImplementedError()

    @nn.compact
    def __call__(self, batch: GraphBatch, training: bool = False):
        initial = self.compute_initial_node_features(batch, training)
        if initial is not batch.node_features:
            batch = batch.replace(node_features=initial)
        final, all_reprs = GNN.from_params(dict(self.gnn_hypers), name="gnn")(
            batch, training
        )
        if self.use_intermediate_gnn_results:
            node_representations = (final, all_reprs)
        else:
            node_representations = final
        return self.compute_task_output(batch, node_representations, training)

    # ---------------- metrics ----------------
    @staticmethod
    def compute_task_metrics(
        batch: GraphBatch, task_output, labels: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        """Pure per-batch loss/metrics; must contain key "loss". Padding is
        masked via batch.node_mask / batch.graph_mask."""
        raise NotImplementedError()

    @staticmethod
    def compute_epoch_metrics(task_results: List[Dict[str, Any]]) -> Tuple[float, str]:
        """Host-side epoch reduction -> (metric where lower is better, text)."""
        raise NotImplementedError()
