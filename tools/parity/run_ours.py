"""Fixed-config training trajectory for tf2_gnn_tpu — the JAX side of
PARITY.md.

Mirrors tools/refrun/refrun.py train: same data, same hyperparameters, and
(optionally) the reference's exact initial weights via --init-ckpt, so both
implementations descend from the identical parameter point. Emits the same
trajectory.json schema for side-by-side comparison.

Usage:
    JAX_PLATFORMS=cpu python tools/parity/run_ours.py \
        --task GraphRegression --model RGCN --data-path tests/fixtures/ref_molecules \
        --epochs 20 --init-ckpt /tmp/ref_train/ckpt_init.hdf5 \
        --model-overrides '{"gnn_layer_input_dropout_rate": 0.0}' --out /tmp/ours
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax  # noqa: E402

# Parity trajectories are defined as deterministic CPU runs. The image's
# sitecustomize imports jax at interpreter startup (before any env var this
# process sets can matter), but backends initialise lazily — pinning the
# platform here still wins (same trick as tests/conftest.py). Set
# PARITY_DEVICE=axon to deliberately run on the chip.
jax.config.update("jax_platforms", os.environ.get("PARITY_DEVICE", "cpu"))

import numpy as np  # noqa: E402

from tf2_gnn_tpu.data.graph_dataset import DataFold  # noqa: E402
from tf2_gnn_tpu.harness.import_reference import import_reference_weights  # noqa: E402
from tf2_gnn_tpu.harness.run import (  # noqa: E402
    get_model_and_dataset_from_args,
    get_train_cli_arg_parser,
)
from tf2_gnn_tpu.harness.training import (  # noqa: E402
    build_training,
    run_eval_epoch,
    run_train_epoch,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--data-path", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--init-ckpt", default=None,
                        help="reference .hdf5 to start from (weight import)")
    parser.add_argument("--model-overrides", default=None)
    parser.add_argument("--data-overrides", default=None)
    args = parser.parse_args()

    cli = get_train_cli_arg_parser()
    argv = [args.model, args.task, args.data_path, "--seed", str(args.seed)]
    if args.model_overrides:
        argv += ["--model-params-override", args.model_overrides]
    if args.data_overrides:
        argv += ["--data-params-override", args.data_overrides]
    model, params, dataset = get_model_and_dataset_from_args(cli.parse_args(argv))

    example_batch, _ = next(dataset.batch_iterator(DataFold.TRAIN))
    state, train_step, eval_step = build_training(model, params, example_batch)

    if args.init_ckpt:
        use_tgt = bool(params.get("gnn_use_target_state_as_input", False))
        imported = import_reference_weights(
            jax.device_get(state.params), args.init_ckpt,
            use_target_state_as_input=use_tgt,
        )
        state = state.replace(params=jax.tree.map(np.asarray, imported))

    os.makedirs(args.out, exist_ok=True)

    def eval_fold(fold):
        loss, _, results = run_eval_epoch(
            eval_step, state.params, dataset.batch_iterator(fold)
        )
        metric, desc = model.compute_epoch_metrics(results)
        return float(loss), float(metric), desc

    init_loss, init_metric, init_desc = eval_fold(DataFold.VALIDATION)
    trajectory = [{"epoch": -1, "valid_loss": init_loss,
                   "valid_metric": init_metric, "valid_desc": init_desc}]
    print(json.dumps(trajectory[0]))

    for epoch in range(args.epochs):
        t0 = time.time()
        state, train_loss, train_speed, train_results = run_train_epoch(
            train_step, state, dataset.batch_iterator(DataFold.TRAIN)
        )
        train_metric, train_desc = model.compute_epoch_metrics(train_results)
        valid_loss, valid_metric, valid_desc = eval_fold(DataFold.VALIDATION)
        row = {
            "epoch": epoch,
            "train_loss": float(train_loss),
            "train_metric": float(train_metric),
            "train_desc": train_desc,
            "valid_loss": valid_loss,
            "valid_metric": valid_metric,
            "valid_desc": valid_desc,
            "wall_s": time.time() - t0,
            "train_graphs_per_s": float(train_speed),
        }
        trajectory.append(row)
        print(json.dumps(row))

    with open(os.path.join(args.out, "trajectory.json"), "wt") as f:
        json.dump(
            {"task": args.task, "model": args.model, "seed": args.seed,
             "epochs": args.epochs, "init_ckpt": args.init_ckpt,
             "trajectory": trajectory},
            f, indent=2,
        )


if __name__ == "__main__":
    main()
