"""Model checkpointing: pytree weights + pickled class/param metadata.

Functional replacement for the reference's model_utils
(tf2_gnn/cli_utils/model_utils.py:37-148): ``save_model`` persists everything
needed to rebuild model+dataset (classes, hyperparameters, dataset metadata,
padding config) plus the parameter pytree; ``load_weights_verbosely`` does a
name-matched partial restore with warnings for fresh/ignored variables.

Format: a single ``.pkl`` file — metadata dict + msgpack-serialised weights
(flax.serialization). The padding config is saved so restored models compile
for exactly the shapes they were trained with.
"""
import pickle
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
from flax import serialization

from ..data.graph_batch import PaddingConfig
from ..data.graph_dataset import GraphDataset


def _flatten_state_dict(tree, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for key, value in tree.items():
            flat.update(_flatten_state_dict(value, f"{prefix}/{key}" if prefix else key))
    else:
        flat[prefix] = np.asarray(tree)
    return flat


def _unflatten_into(template_flat: Dict[str, np.ndarray],
                    saved_flat: Dict[str, np.ndarray],
                    log: Callable[[str], None]) -> Dict[str, np.ndarray]:
    restored = {}
    used = set()
    for name, value in template_flat.items():
        if name in saved_flat:
            saved = saved_flat[name]
            if tuple(saved.shape) != tuple(value.shape):
                log(
                    f"W: checkpoint var {name} has shape {saved.shape}, model "
                    f"expects {value.shape}; keeping fresh initialisation."
                )
                restored[name] = value
            else:
                restored[name] = saved
                used.add(name)
        else:
            log(f"W: {name} not found in checkpoint; keeping fresh initialisation.")
            restored[name] = value
    for name in saved_flat:
        if name not in used and name not in template_flat:
            log(f"W: checkpoint var {name} not used by the model; ignored.")
    return restored


def _rebuild_tree(template, flat: Dict[str, np.ndarray], prefix=""):
    if isinstance(template, dict):
        return {
            key: _rebuild_tree(value, flat, f"{prefix}/{key}" if prefix else key)
            for key, value in template.items()
        }
    return flat[prefix]


def save_model(
    path,
    model,
    model_params: Dict[str, Any],
    dataset: GraphDataset,
    params_tree,
    extra_metadata: Optional[Dict[str, Any]] = None,
    opt_state=None,
    step: Optional[int] = None,
) -> None:
    """Persist model weights + everything needed to rebuild model/dataset.

    ``opt_state``/``step`` (optional) enable EXACT training resume — an
    improvement over the reference, which restarts optimization from scratch
    on restore (model_utils.py saves weights only, SURVEY.md §5.4).
    """
    state_dict = serialization.to_state_dict(params_tree)
    data = {
        "model_class": type(model),
        "model_params": model_params,
        "dataset_class": type(dataset),
        "dataset_params": dataset.params,
        "dataset_metadata": dataset.metadata,
        "num_edge_types": dataset.num_edge_types,
        "node_feature_shape": tuple(dataset.node_feature_shape),
        "padding_config": {
            "num_nodes": dataset.padding_config.num_nodes,
            "num_graphs": dataset.padding_config.num_graphs,
            "edge_budgets": tuple(dataset.padding_config.edge_budgets),
        },
        "weights": serialization.msgpack_serialize(state_dict),
    }
    if opt_state is not None:
        data["opt_state"] = serialization.msgpack_serialize(
            serialization.to_state_dict(opt_state)
        )
    if step is not None:
        data["step"] = int(step)
    if extra_metadata:
        data.update(extra_metadata)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)


def load_checkpoint_metadata(path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_weights_verbosely(
    checkpoint: Dict[str, Any],
    template_params,
    log: Callable[[str], None] = print,
):
    """Name-matched partial restore of a parameter pytree.

    Variables present in both checkpoint and model (same shape) are restored;
    everything else keeps its fresh initialisation, with a warning — mirroring
    the reference's tolerant loader (model_utils.py:111-148).
    """
    saved_state = serialization.msgpack_restore(checkpoint["weights"])
    template_state = serialization.to_state_dict(template_params)
    template_flat = _flatten_state_dict(template_state)
    saved_flat = _flatten_state_dict(saved_state)
    restored_flat = _unflatten_into(template_flat, saved_flat, log)
    restored_state = _rebuild_tree(template_state, restored_flat)
    return serialization.from_state_dict(template_params, restored_state)


def restore_dataset(checkpoint: Dict[str, Any],
                    dataset_params_override: Optional[Dict[str, Any]] = None
                    ) -> GraphDataset:
    """Rebuild the dataset object (without data) from checkpoint metadata."""
    dataset_params = dict(checkpoint["dataset_params"])
    if dataset_params_override:
        dataset_params.update(dataset_params_override)
    dataset = checkpoint["dataset_class"](
        dataset_params, metadata=checkpoint.get("dataset_metadata")
    )
    pc = checkpoint.get("padding_config")
    if pc:
        dataset.set_padding_config(
            PaddingConfig(
                num_nodes=pc["num_nodes"],
                num_graphs=pc["num_graphs"],
                edge_budgets=tuple(pc["edge_budgets"]),
            )
        )
    return dataset


def restore_opt_state(checkpoint: Dict[str, Any], template_opt_state):
    """Restore optimizer state for exact resume, or None if not saved."""
    blob = checkpoint.get("opt_state")
    if blob is None:
        return None
    return serialization.from_state_dict(
        template_opt_state, serialization.msgpack_restore(blob)
    )


def restore_model_and_params(
    checkpoint: Dict[str, Any],
    dataset: GraphDataset,
    params_override: Optional[Dict[str, Any]] = None,
) -> Tuple[Any, Dict[str, Any]]:
    """Rebuild the (un-initialised) model object from checkpoint metadata."""
    model_params = dict(checkpoint["model_params"])
    if params_override:
        model_params.update(params_override)
    model = checkpoint["model_class"].from_params(model_params, dataset)
    return model, model_params
