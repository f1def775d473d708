"""Training/eval run orchestration: the harness behind the CLIs.

Reference: tf2_gnn/cli_utils/training_utils.py:103-360 and
model_utils.py:232-321. Wires the layered config system, task registry,
checkpointing and the train loop into ``run_train_from_args`` /
``run_test_from_args``.
"""
import argparse
import json
import random
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from ..data.graph_dataset import DataFold, GraphDataset
from ..layers.message_passing import get_known_message_passing_classes
from .checkpoint import (
    load_checkpoint_metadata,
    load_weights_verbosely,
    restore_dataset,
    restore_model_and_params,
    save_model,
)
from .config import (
    apply_hyperdrive_overrides,
    load_default_hypers,
    merge_params,
    parse_params_override,
)
from .evaluation import evaluate_model
from .tasks import task_name_to_dataset_class, task_name_to_model_class
from .training import (
    build_training,
    make_predict_step,
    run_eval_epoch,
    train_loop,
)


def make_run_id(model_name: str, task_name: str, run_name: Optional[str] = None) -> str:
    """Unique run id (reference training_utils.py:26-31)."""
    if run_name is not None:
        return run_name
    return f"{model_name}_{task_name}__{time.strftime('%Y-%m-%d_%H-%M-%S')}"


def log_line(log_file: Optional[Path], msg: str) -> None:
    if log_file is not None:
        with open(log_file, "a") as f:
            f.write(msg + "\n")
    print(msg, flush=True)


def set_seeds(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def get_model_and_dataset_from_args(
    args: argparse.Namespace,
    hyperdrive_overrides: Optional[Dict[str, str]] = None,
) -> Tuple[Any, Dict[str, Any], GraphDataset]:
    """Resolve (model, model_params, loaded dataset) for a training run.

    Three modes, mirroring model_utils.py:232-321:
    * fresh: build from task registry + default hypers + overrides,
    * ``--load-saved-model``: rebuild everything from the checkpoint,
    * ``--load-weights-only``: fresh config, then partial weight restore
      (done later by the caller once the model is initialised).
    """
    if getattr(args, "load_saved_model", None):
        checkpoint = load_checkpoint_metadata(args.load_saved_model)
        dataset = restore_dataset(
            checkpoint, parse_params_override(getattr(args, "data_params_override", None))
        )
        folds = {DataFold.TRAIN, DataFold.VALIDATION}
        dataset.load_data(args.data_path, folds)
        model, model_params = restore_model_and_params(checkpoint, dataset)
        return model, model_params, dataset

    dataset_cls, task_dataset_hypers = task_name_to_dataset_class(args.task)
    model_cls, task_model_hypers = task_name_to_model_class(args.task)
    shipped = load_default_hypers(args.task, args.model)

    dataset_params = merge_params(
        dataset_cls.get_default_hyperparameters(),
        task_dataset_hypers,
        shipped["task_params"],
        parse_params_override(getattr(args, "data_params_override", None)),
    )
    model_params = merge_params(
        model_cls.get_default_hyperparameters(mp_style=args.model.lower()),
        task_model_hypers,
        shipped["model_params"],
        parse_params_override(getattr(args, "model_params_override", None)),
    )
    if hyperdrive_overrides:
        dataset_params = apply_hyperdrive_overrides(dataset_params, hyperdrive_overrides)
        model_params = apply_hyperdrive_overrides(model_params, hyperdrive_overrides)

    dataset = dataset_cls(
        dataset_params,
        use_worker_threads=getattr(args, "use_worker_threads", False),
    )
    dataset.load_data(args.data_path, {DataFold.TRAIN, DataFold.VALIDATION})
    model = model_cls.from_params(model_params, dataset)
    return model, model_params, dataset


def run_train_from_args(
    args: argparse.Namespace,
    hyperdrive_overrides: Optional[Dict[str, str]] = None,
) -> Path:
    """Full training run; returns the path of the best checkpoint."""
    run_id = make_run_id(args.model, args.task, getattr(args, "run_name", None))
    save_dir = Path(getattr(args, "save_dir", "trained_models"))
    save_dir.mkdir(parents=True, exist_ok=True)
    log_file = save_dir / f"{run_id}.log"
    log = lambda msg: log_line(log_file, msg)  # noqa: E731

    if getattr(args, "disable_jit", False):
        # Reference --disable-tf-func analog: run every step eagerly.
        import jax

        jax.config.update("jax_disable_jit", True)
        log("jit disabled (--disable-tf-func): running steps eagerly.")
    if getattr(args, "azure_info", None):
        log("--azure-info accepted for compatibility; azure:// paths "
            "resolve through data/io.py::register_path_resolver (install "
            "a download-and-cache hook for your storage SDK).")

    seed = getattr(args, "random_seed", 0)
    set_seeds(seed)

    model, model_params, dataset = get_model_and_dataset_from_args(
        args, hyperdrive_overrides
    )
    log(f"Dataset parameters: {json.dumps(dict(dataset.params), default=str)}")
    log(f"Model parameters: {json.dumps(model_params, default=str)}")

    example_batch, _ = next(dataset.batch_iterator(DataFold.TRAIN))
    state, train_step, eval_step = build_training(
        model, model_params, example_batch, seed=seed
    )

    if getattr(args, "load_weights_only", None):
        checkpoint = load_checkpoint_metadata(args.load_weights_only)
        state = state.replace(
            params=load_weights_verbosely(checkpoint, state.params, log=log)
        )
    elif getattr(args, "load_saved_model", None):
        # Full restore: weights + (if saved) optimizer state and step counter
        # for exact resume — the reference restarts optimization (SURVEY §5.4).
        from .checkpoint import restore_opt_state

        checkpoint = load_checkpoint_metadata(args.load_saved_model)
        state = state.replace(
            params=load_weights_verbosely(checkpoint, state.params, log=log)
        )
        restored_opt = restore_opt_state(checkpoint, state.opt_state)
        if restored_opt is not None:
            state = state.replace(opt_state=restored_opt)
        if "step" in checkpoint:
            import jax.numpy as jnp

            state = state.replace(step=jnp.asarray(checkpoint["step"],
                                                   dtype=jnp.int32))

    checkpoint_path = save_dir / f"{run_id}_best.pkl"

    def save_fun(s):
        save_model(checkpoint_path, model, model_params, dataset, s.params,
                   opt_state=s.opt_state, step=int(s.step))

    from .metrics_log import MetricsLogger

    profile_dir = getattr(args, "profile_dir", None)
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)

    with MetricsLogger(save_dir / f"{run_id}_metrics.jsonl", run_id) as mlog:
        mlog.log("run_start", model=args.model, task=args.task, seed=seed)
        state, best_metric = train_loop(
            model,
            state,
            train_step,
            eval_step,
            dataset,
            max_epochs=getattr(args, "max_epochs", 10000),
            patience=getattr(args, "patience", 25),
            log_fun=log,
            save_model_fun=save_fun,
            quiet=getattr(args, "quiet", True),
            metrics_logger=mlog,
        )
        mlog.log("run_end", best_valid_metric=float(best_metric))
    if profile_dir:
        import jax

        jax.profiler.stop_trace()
        log(f"Profiler trace written to {profile_dir}.")
    log(f"Best validation metric: {best_metric:.5f} "
        f"(checkpoint {checkpoint_path}).")

    if getattr(args, "run_test", False):
        test_model(checkpoint_path, args.data_path, log=log)
    return checkpoint_path


def test_model(checkpoint_path, data_path, log: Callable[[str], None] = print,
               model_params_override=None, data_params_override=None) -> float:
    """Load a checkpoint and evaluate on the TEST fold
    (reference cli/test.py:12-36)."""
    import jax

    checkpoint = load_checkpoint_metadata(checkpoint_path)
    dataset = restore_dataset(
        checkpoint, parse_params_override(data_params_override))
    dataset.load_data(data_path, {DataFold.TEST})
    model, model_params = restore_model_and_params(
        checkpoint, dataset,
        params_override=parse_params_override(model_params_override))

    example_batch, _ = next(dataset.batch_iterator(DataFold.TEST))
    variables = model.init(jax.random.PRNGKey(0), example_batch, False)
    params = load_weights_verbosely(checkpoint, variables["params"], log=log)

    from .training import make_eval_step

    eval_step = make_eval_step(model)
    loss, speed, results = run_eval_epoch(
        eval_step, params, dataset.batch_iterator(DataFold.TEST)
    )
    metric, metric_str = model.compute_epoch_metrics(results)
    log(f"Test: {loss:.4f} loss | {metric_str} | {speed:.2f} graphs/s")

    if getattr(model, "EVAL_KIND", None):
        predict_step = make_predict_step(model)
        try:
            evaluate_model(
                model, predict_step, params,
                dataset.batch_iterator(DataFold.TEST), log=log,
            )
        except NotImplementedError:
            pass
    return metric


def get_train_cli_arg_parser() -> argparse.ArgumentParser:
    """CLI surface mirroring the reference
    (cli_utils/training_utils.py:223-360)."""
    parser = argparse.ArgumentParser(
        description="Train a TPU-native GNN model.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    model_choices = sorted(
        {name.upper() for name in get_known_message_passing_classes()}
        | set(get_known_message_passing_classes())
    )
    parser.add_argument("model", type=str, help="GNN model type to train.")
    parser.add_argument("task", type=str, help="Task to train on.")
    parser.add_argument("data_path", type=str, help="Directory with the task data.")
    parser.add_argument("--save-dir", type=str, default="trained_models")
    parser.add_argument("--model-params-override", type=str, default=None,
                        help="JSON string or file overriding model hypers.")
    parser.add_argument("--data-params-override", type=str, default=None,
                        help="JSON string or file overriding dataset hypers.")
    parser.add_argument("--max-epochs", type=int, default=10000)
    parser.add_argument("--patience", type=int, default=25)
    parser.add_argument("--seed", dest="random_seed", type=int, default=0)
    parser.add_argument("--run-name", type=str, default=None)
    parser.add_argument("--load-saved-model", type=str, default=None,
                        help="Checkpoint to fully restore (config + weights).")
    parser.add_argument("--load-weights-only", type=str, default=None,
                        help="Checkpoint whose weights initialise a fresh run.")
    parser.add_argument("--run-test", action="store_true",
                        help="Evaluate the best checkpoint on TEST after training.")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of the training run "
                             "into this directory (view with "
                             "TensorBoard/XProf).")
    parser.add_argument("--no-worker-threads", dest="use_worker_threads",
                        action="store_false", default=True,
                        help="Disable background-thread batch assembly "
                             "(reference default pipeline: worker thread + "
                             "prefetch, graph_dataset.py:292-297).")
    parser.add_argument("--quiet", action="store_true", default=False)
    parser.add_argument("--debug", action="store_true", default=False,
                        help="Drop into pdb post-mortem on exceptions.")
    # Drop-in compatibility with the reference CLI surface
    # (cli_utils/training_utils.py:302-345):
    parser.add_argument("--disable-tf-func", dest="disable_jit",
                        action="store_true", default=False,
                        help="Run without jit compilation (the reference's "
                             "--disable-tf-func analog) for step debugging.")
    parser.add_argument("--azure-info", type=str, default=None,
                        help="Accepted for reference compatibility; azure:// "
                             "data paths are not supported (data/io.py).")
    parser.add_argument("--azureml_logging", action="store_true",
                        default=False,
                        help="Accepted for reference compatibility; metrics "
                             "always stream to <run>_metrics.jsonl instead "
                             "of AzureML.")
    return parser


def parse_hyperdrive_leftovers(leftovers) -> Dict[str, str]:
    """Interpret leftover ``--key value`` pairs as string overrides
    (reference cli/train.py:17-26)."""
    if len(leftovers) % 2 != 0:
        raise ValueError(
            f"Unmatched hyperdrive override arguments: {leftovers}"
        )
    overrides = {}
    for i in range(0, len(leftovers), 2):
        key = leftovers[i]
        if not key.startswith("--"):
            raise ValueError(f"Override key {key} must start with '--'.")
        overrides[key[2:]] = leftovers[i + 1]
    return overrides


def run_and_debug(func: Callable[[], Any], enable_debugging: bool):
    """pdb-on-exception wrapper (dpu-utils run_and_debug equivalent)."""
    try:
        return func()
    except Exception:
        if enable_debugging:
            import pdb
            import sys
            import traceback

            traceback.print_exc()
            pdb.post_mortem(sys.exc_info()[2])
        else:
            raise
