"""Execute the reference tf2-gnn in-place for parity artifacts.

Runs `/root/reference/tf2_gnn` (read-only, via sys.path) on CPU TensorFlow
with the local dpu-utils shim (tools/refshim) and legacy Keras, producing:

* ``dump``  — a REAL reference checkpoint (save_model .pkl + .hdf5,
  reference cli_utils/model_utils.py:37-71) plus an .npz of the first batch,
  per-layer GNN representations (gnn.py:269-274 capture semantics), task
  output, loss, and every variable by name — the ground truth for
  tf2_gnn_tpu's weight importer and per-layer allclose parity tests.
* ``train`` — a fixed-seed training trajectory (per-epoch train/valid
  loss + metrics) as JSON, the reference side of PARITY.md.

Usage:
    python tools/refrun/refrun.py dump  --task GraphRegression --model RGCN \
        --data-path /root/reference/tf2_gnn/test/test_datasets --out /tmp/ref_rgcn
    python tools/refrun/refrun.py train --task GraphRegression --model RGCN \
        --data-path ... --epochs 10 --out /tmp/ref_rgcn_train
"""
import argparse
import json
import os
import random
import sys
import time

# Environment must be pinned before TensorFlow is imported.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "refshim"))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import tensorflow as tf  # noqa: E402

from dpu_utils.utils import RichPath  # noqa: E402 (shim)


def set_seeds(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    tf.random.set_seed(seed)


def build(task, model, data_path, seed, model_overrides=None, data_overrides=None):
    from tf2_gnn.cli_utils.model_utils import get_model_and_dataset
    from tf2_gnn.data import DataFold

    set_seeds(seed)
    dataset, task_model = get_model_and_dataset(
        task_name=task,
        msg_passing_implementation=model,
        data_path=RichPath.create(data_path),
        trained_model_file=None,
        cli_data_hyperparameter_overrides=json.dumps(data_overrides or {}),
        cli_model_hyperparameter_overrides=json.dumps(model_overrides or {}),
        folds_to_load={DataFold.TRAIN, DataFold.VALIDATION},
    )
    return dataset, task_model


def first_batch(dataset, fold):
    """Deterministic first batch as numpy dicts (no shuffle for VALID fold)."""
    tf_ds = dataset.get_tensorflow_dataset(fold, use_worker_threads=False)
    features, labels = next(iter(tf_ds))
    to_np = lambda d: {k: np.asarray(v) for k, v in d.items()}
    return to_np(features), to_np(labels)


def cmd_dump(args):
    from tf2_gnn.cli_utils.model_utils import save_model
    from tf2_gnn.data import DataFold
    from tf2_gnn.layers import GNNInput

    overrides = json.loads(args.model_overrides or "{}")
    dataset, model = build(
        args.task, args.model, args.data_path, args.seed, model_overrides=overrides,
        data_overrides=json.loads(args.data_overrides or "{}"),
    )
    os.makedirs(args.out, exist_ok=True)
    save_model(os.path.join(args.out, "ckpt.pkl"), model, dataset)

    # VALID fold: reference does not shuffle it (ppi_dataset.py:175-179 /
    # graph_dataset.py _graph_iterator), so batch composition is reproducible.
    features, labels = first_batch(dataset, DataFold.VALIDATION)
    tff = {k: tf.constant(v) for k, v in features.items()}

    num_edge_types = dataset.num_edge_types
    gnn_input = GNNInput(
        node_features=tff["node_features"],
        adjacency_lists=tuple(
            tff[f"adjacency_list_{i}"] for i in range(num_edge_types)
        ),
        node_to_graph_map=tff["node_to_graph_map"],
        num_graphs=tff["num_graphs_in_batch"],
    )
    final_reps, all_reps = model._gnn(
        gnn_input, training=False, return_all_representations=True
    )
    task_output = model(tff, training=False)
    tfl = {k: tf.constant(v) for k, v in labels.items()}
    metrics = model.compute_task_metrics(
        batch_features=tff, task_output=task_output, batch_labels=tfl
    )

    # Loss gradients at the initial point (training=False so dropout is off
    # and the gradient is deterministic) — backward-parity ground truth.
    with tf.GradientTape() as tape:
        out = model(tff, training=False)
        grad_metrics = model.compute_task_metrics(
            batch_features=tff, task_output=out, batch_labels=tfl
        )
    grads = tape.gradient(grad_metrics["loss"], model.trainable_variables)
    grad_arrays = {}
    for var, grad in zip(model.trainable_variables, grads):
        if grad is not None:
            g = grad.values if isinstance(grad, tf.IndexedSlices) else grad
            dense = np.zeros(var.shape, dtype=np.float32)
            if isinstance(grad, tf.IndexedSlices):
                np.add.at(dense, np.asarray(grad.indices), np.asarray(g))
            else:
                dense = np.asarray(g)
            grad_arrays[f"grad::{var.name}"] = dense

    arrays = {}
    for k, v in features.items():
        arrays[f"feat::{k}"] = v
    for k, v in labels.items():
        arrays[f"label::{k}"] = v
    for i, rep in enumerate(all_reps):
        arrays[f"rep::{i}"] = np.asarray(rep)
    arrays["final_reps"] = np.asarray(final_reps)
    if isinstance(task_output, (list, tuple)):
        for i, t in enumerate(task_output):
            arrays[f"task_output::{i}"] = np.asarray(t)
    else:
        arrays["task_output"] = np.asarray(task_output)
    arrays["loss"] = np.asarray(metrics["loss"])
    arrays.update(grad_arrays)
    for var in model.variables:
        arrays[f"var::{var.name}"] = var.value().numpy()
    meta = {
        "task": args.task,
        "model": args.model,
        "seed": args.seed,
        "num_edge_types": num_edge_types,
        "node_feature_dim": int(dataset.node_feature_shape[0]),
        "model_params": {k: v for k, v in model._params.items()},
        "dataset_params": {k: v for k, v in dataset._params.items()},
    }
    np.savez_compressed(os.path.join(args.out, "dump.npz"), **arrays)
    with open(os.path.join(args.out, "meta.json"), "wt") as f:
        json.dump(meta, f, indent=2, default=str)
    print(f"dumped {len(arrays)} arrays to {args.out} (loss={float(metrics['loss']):.6f})")


def cmd_train(args):
    from tf2_gnn.data import DataFold

    dataset, model = build(
        args.task, args.model, args.data_path, args.seed,
        model_overrides=json.loads(args.model_overrides or "{}"),
        data_overrides=json.loads(args.data_overrides or "{}"),
    )
    os.makedirs(args.out, exist_ok=True)
    from tf2_gnn.cli_utils.model_utils import save_model

    # Initial weights BEFORE any training — lets the TPU framework start from
    # the identical parameter point for trajectory comparison.
    save_model(os.path.join(args.out, "ckpt_init.pkl"), model, dataset)
    train_data = dataset.get_tensorflow_dataset(
        DataFold.TRAIN, use_worker_threads=False
    )
    valid_data = dataset.get_tensorflow_dataset(
        DataFold.VALIDATION, use_worker_threads=False
    )
    # Initial (untrained) validation metrics — the reference README's own
    # first reported number is this quantity (README.md:44).
    init_loss, _, init_results = model.run_one_epoch(
        valid_data, training=False, quiet=True
    )
    init_metric, init_desc = model.compute_epoch_metrics(init_results)
    print(json.dumps({"epoch": -1, "valid_loss": float(init_loss),
                      "valid_metric": float(init_metric), "valid_desc": init_desc}))
    trajectory = [
        {
            "epoch": -1,
            "valid_loss": float(init_loss),
            "valid_metric": float(init_metric),
            "valid_desc": init_desc,
        }
    ]
    for epoch in range(args.epochs):
        t0 = time.time()
        train_loss, train_speed, train_results = model.run_one_epoch(
            train_data, training=True, quiet=True
        )
        train_metric, train_desc = model.compute_epoch_metrics(train_results)
        valid_loss, valid_speed, valid_results = model.run_one_epoch(
            valid_data, training=False, quiet=True
        )
        valid_metric, valid_desc = model.compute_epoch_metrics(valid_results)
        row = {
            "epoch": epoch,
            "train_loss": float(train_loss),
            "train_metric": float(train_metric),
            "train_desc": train_desc,
            "valid_loss": float(valid_loss),
            "valid_metric": float(valid_metric),
            "valid_desc": valid_desc,
            "wall_s": time.time() - t0,
            "train_graphs_per_s": float(train_speed),
        }
        trajectory.append(row)
        print(json.dumps(row))
    with open(os.path.join(args.out, "trajectory.json"), "wt") as f:
        json.dump(
            {
                "task": args.task,
                "model": args.model,
                "seed": args.seed,
                "epochs": args.epochs,
                "trajectory": trajectory,
            },
            f,
            indent=2,
        )
    if args.save_ckpt:
        from tf2_gnn.cli_utils.model_utils import save_model

        save_model(os.path.join(args.out, "ckpt.pkl"), model, dataset)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, fn in [("dump", cmd_dump), ("train", cmd_train)]:
        p = sub.add_parser(name)
        p.add_argument("--task", required=True)
        p.add_argument("--model", required=True)
        p.add_argument("--data-path", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--model-overrides", default=None)
        p.add_argument("--data-overrides", default=None)
        p.set_defaults(fn=fn)
        if name == "train":
            p.add_argument("--epochs", type=int, default=10)
            p.add_argument("--save-ckpt", action="store_true")
    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
