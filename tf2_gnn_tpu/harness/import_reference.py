"""Import reference tf2-gnn Keras .hdf5 weights into a tf2_gnn_tpu pytree.

The reference checkpoints (tf2_gnn/cli_utils/model_utils.py:62-71) store
weights in an HDF5 file keyed by name-scoped variable paths built from
(reference gnn.py:133-176, gnn_edge_mlp.py:75):

    <MPClass>_GNN/gnn_initial_node_projection/...
    <MPClass>_GNN/Layer_<i>/MessagePassing/edge_type_<l>/...
    <MPClass>_GNN/Layer_<i>/Dense/... , .../LayerNorm/... , .../Global_Exchange/...

This tool walks every dataset in the file, classifies variables by path
substrings + shapes, and assembles the TPU-native layout (per-edge-type
kernels stacked into [L, D, H]; concat-input kernels split into
source/target halves). Anything unmatched is reported, mirroring
load_weights_verbosely's tolerant semantics.
"""
import re
from typing import Any, Callable, Dict, List, Tuple

import numpy as np

try:  # pragma: no cover - environment-dependent
    import h5py
except Exception:  # pragma: no cover
    h5py = None


def read_h5_variables(path) -> Dict[str, np.ndarray]:
    """Flatten an HDF5 weight file into {full_path: array}."""
    if h5py is None:
        raise RuntimeError("h5py is required to import reference checkpoints.")
    out: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return out


_LAYER_RE = re.compile(r"Layer_(\d+)")
_EDGE_TYPE_RE = re.compile(r"edge_type_(\d+)")
_DENSE_IDX_RE = re.compile(r"dense_layer_(\d+)|_(\d+)/kernel")


def import_gnn_weights(
    h5_variables: Dict[str, np.ndarray],
    num_edge_types: int,
    use_target_state_as_input: bool = False,
    log: Callable[[str], None] = print,
) -> Dict[str, Any]:
    """Assemble the GNN-core pytree fragment from reference h5 variables.

    Returns a nested dict matching the ``gnn`` subtree of our models:
    ``initial_node_projection``, ``mp_layer_<i>`` (stacked typed kernels,
    split into src/tgt halves when the reference used concat input),
    ``dense_<i>``, ``layernorm_<i>``. Readout/task-head variables are left to
    the caller (they are model-specific).
    """
    gnn: Dict[str, Any] = {}
    # (layer, mlp_depth) -> {edge_type: kernel}
    typed: Dict[Tuple[int, int], Dict[int, np.ndarray]] = {}
    unmatched: List[str] = []

    for name, value in h5_variables.items():
        if "gnn_initial_node_projection" in name and name.endswith("kernel:0"):
            gnn.setdefault("initial_node_projection", {})["kernel"] = value
            continue
        layer_m = _LAYER_RE.search(name)
        if layer_m and "MessagePassing" in name and "kernel" in name:
            layer = int(layer_m.group(1))
            type_m = _EDGE_TYPE_RE.search(name)
            if type_m:
                edge_type = int(type_m.group(1))
                depth_m = re.search(r"dense_layer_(\d+)", name)
                depth = int(depth_m.group(1)) if depth_m else 0
                typed.setdefault((layer, depth), {})[edge_type] = value
                continue
        if layer_m and "/Dense/" in name and name.endswith("kernel:0"):
            gnn.setdefault(f"dense_{int(layer_m.group(1))}", {})["kernel"] = value
            continue
        if layer_m and "LayerNorm" in name:
            ln = gnn.setdefault(f"layernorm_{int(layer_m.group(1))}", {})
            if name.endswith("gamma:0"):
                ln["scale"] = value
            elif name.endswith("beta:0"):
                ln["bias"] = value
            continue
        unmatched.append(name)

    for (layer, depth), kernels in sorted(typed.items()):
        if len(kernels) != num_edge_types:
            log(
                f"W: Layer {layer} depth {depth}: found {len(kernels)} per-type "
                f"kernels, expected {num_edge_types}; skipping."
            )
            continue
        stacked = np.stack([kernels[t] for t in range(num_edge_types)], axis=0)
        mp = gnn.setdefault(f"mp_layer_{layer}", {})
        if use_target_state_as_input and depth == 0:
            # Reference: Dense(concat(src, tgt)) with kernel [2D, H]; our
            # layout splits it into source/target halves [D, H] each
            # (gnn_edge_mlp.py docstring) — an exactly equivalent computation.
            d = stacked.shape[1] // 2
            mp["edge_mlp_src_0"] = {"kernel": stacked[:, :d, :]}
            mp["edge_mlp_tgt_0"] = {"kernel": stacked[:, d:, :]}
        else:
            mp[f"edge_mlp_layer_{depth}"] = {"kernel": stacked}

    for name in unmatched:
        log(f"W: reference variable not mapped: {name}")
    return gnn


def import_into_params(
    params: Dict[str, Any],
    h5_path,
    num_edge_types: int,
    use_target_state_as_input: bool = False,
    log: Callable[[str], None] = print,
) -> Dict[str, Any]:
    """Return a copy of ``params`` with the gnn subtree overwritten by the
    reference weights (shape-checked; mismatches keep the fresh value)."""
    h5_vars = read_h5_variables(h5_path)
    imported = import_gnn_weights(
        h5_vars, num_edge_types, use_target_state_as_input, log=log
    )

    def merge(dst, src, prefix="gnn"):
        out = dict(dst)
        for key, value in src.items():
            if key not in out:
                log(f"W: imported {prefix}/{key} has no counterpart; ignored.")
                continue
            if isinstance(value, dict):
                out[key] = merge(out[key], value, f"{prefix}/{key}")
            else:
                if tuple(np.shape(out[key])) != tuple(np.shape(value)):
                    log(
                        f"W: shape mismatch for {prefix}/{key}: model "
                        f"{np.shape(out[key])} vs import {np.shape(value)}; kept fresh."
                    )
                else:
                    out[key] = np.asarray(value, dtype=np.float32)
        return out

    # Task models nest the encoder under "gnn"; a bare GNN module's params
    # ARE the gnn tree.
    if "gnn" in params:
        new_params = dict(params)
        new_params["gnn"] = merge(params["gnn"], imported)
        return new_params
    return merge(params, imported)
