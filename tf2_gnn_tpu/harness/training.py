"""Training core: TrainState, jitted train/eval steps, epoch + patience loop.

Functional replacement for the reference's Keras training machinery
(tf2_gnn/models/graph_task_model.py:327-398 and
cli_utils/training_utils.py:40-134). One XLA program per (train, eval) pair —
the padded static batch shapes guarantee a single compile each.
"""
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.graph_batch import GraphBatch
from ..data.graph_dataset import DataFold, GraphDataset
from ..models.graph_task_model import GraphTaskModel
from .optimizers import make_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray


def init_model(
    model: GraphTaskModel, batch: GraphBatch, seed: int = 0
) -> Dict[str, Any]:
    """Initialise model variables from one example batch."""
    rng = jax.random.PRNGKey(seed)
    return model.init(rng, batch, False)


def create_train_state(
    model: GraphTaskModel,
    batch: GraphBatch,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
) -> TrainState:
    variables = init_model(model, batch, seed)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        rng=jax.random.PRNGKey(seed + 1),
    )


def make_train_step(model: GraphTaskModel, optimizer: optax.GradientTransformation):
    """Jitted (state, batch, labels) -> (state, metrics) step with dropout."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: GraphBatch, labels: Dict[str, jnp.ndarray]):
        next_rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            task_output = model.apply(
                {"params": params}, batch, True, rngs={"dropout": dropout_rng}
            )
            metrics = model.compute_task_metrics(batch, task_output, labels)
            return metrics["loss"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=next_rng
        )
        return new_state, metrics

    return train_step


def make_eval_step(model: GraphTaskModel):
    """Jitted (params, batch, labels) -> metrics step (no dropout)."""

    @jax.jit
    def eval_step(params, batch: GraphBatch, labels: Dict[str, jnp.ndarray]):
        task_output = model.apply({"params": params}, batch, False)
        return model.compute_task_metrics(batch, task_output, labels)

    return eval_step


def make_predict_step(model: GraphTaskModel):
    @jax.jit
    def predict_step(params, batch: GraphBatch):
        return model.apply({"params": params}, batch, False)

    return predict_step


def predict(model: GraphTaskModel, params, batches) -> Any:
    """Run prediction over a batch stream and concatenate the REAL rows of
    each output (reference GraphTaskModel.predict,
    tf2_gnn/models/graph_task_model.py:401-408).

    Per-graph outputs keep rows [:num_graphs]; per-node outputs keep rows
    [:num_nodes]; tuple outputs are handled elementwise.
    """
    predict_step = make_predict_step(model)
    pieces: List[Any] = []
    for batch, _ in batches:
        out = predict_step(params, batch)
        n_graphs = int(np.asarray(batch.num_graphs))
        n_nodes = int(np.asarray(batch.num_nodes))

        def trim(x):
            x = np.asarray(x)
            if x.shape[0] == batch.num_graphs_padded:
                return x[:n_graphs]
            if x.shape[0] == batch.num_nodes_padded:
                return x[:n_nodes]
            return x

        pieces.append(jax.tree.map(trim, out))
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *pieces)


def _to_host(metrics: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in metrics.items()}


def device_prefetch(
    batches: Iterable, depth: int = 2
) -> Iterable:
    """Asynchronously stage upcoming batches on device.

    ``jax.device_put`` is async: while the device executes step k, the
    transfer of batch k+1 is already in flight, hiding H2D latency the way
    the reference hides host packing with ``.prefetch(3)``
    (graph_dataset.py:292-297). Composes with the dataset's worker-thread
    batch assembly (data/prefetch.py) for a full host->transfer->compute
    pipeline.
    """
    import collections

    import jax

    iterator = iter(batches)
    buffer: "collections.deque" = collections.deque()

    def stage():
        try:
            buffer.append(jax.device_put(next(iterator)))
            return True
        except StopIteration:
            return False

    for _ in range(depth):
        if not stage():
            break
    while buffer:
        item = buffer.popleft()
        stage()
        yield item


def run_train_epoch(
    train_step,
    state: TrainState,
    batches: Iterable[Tuple[GraphBatch, Dict[str, np.ndarray]]],
    quiet: bool = True,
    log_fun: Callable[[str], None] = print,
    prefetch_depth: int = 2,
) -> Tuple[TrainState, float, float, List[Dict[str, np.ndarray]]]:
    """One training epoch; returns (state, per-graph avg loss, graphs/s, results).

    The loop is fully pipelined: batches are staged on device ahead of time
    (``device_prefetch``) and per-step metrics stay on device until the end
    of the epoch, so quiet training never synchronises host<->device inside
    the epoch. Non-quiet logging forces a per-step sync (diagnostics path).
    """
    start = time.time()
    device_metrics: List[Dict[str, jnp.ndarray]] = []
    step_num_graphs: List[jnp.ndarray] = []
    running_loss, running_graphs = 0.0, 0
    for step, (batch, labels) in enumerate(
        device_prefetch(batches, depth=prefetch_depth)
    ):
        state, metrics = train_step(state, batch, labels)
        device_metrics.append(metrics)
        step_num_graphs.append(metrics.get("num_graphs", batch.num_graphs))
        if not quiet:
            host = _to_host(metrics)
            num_graphs = int(np.asarray(step_num_graphs[-1]))
            running_loss += float(host["loss"]) * num_graphs
            running_graphs += num_graphs
            log_fun(
                f"   Step {step:4d} | batch loss {float(host['loss']):.5f} "
                f"| epoch avg {running_loss / max(running_graphs, 1):.5f}"
            )
    results = [_to_host(m) for m in device_metrics]
    elapsed = max(time.time() - start, 1e-9)
    graph_counts = [int(np.asarray(g)) for g in step_num_graphs]
    total_loss = sum(
        float(m["loss"]) * g for m, g in zip(results, graph_counts)
    )
    total_graphs = sum(graph_counts)
    return state, total_loss / max(total_graphs, 1), total_graphs / elapsed, results


def run_eval_epoch(
    eval_step,
    params,
    batches: Iterable[Tuple[GraphBatch, Dict[str, np.ndarray]]],
) -> Tuple[float, float, List[Dict[str, np.ndarray]]]:
    start = time.time()
    total_loss, total_graphs = 0.0, 0
    results: List[Dict[str, np.ndarray]] = []
    for batch, labels in batches:
        metrics = _to_host(eval_step(params, batch, labels))
        num_graphs = int(metrics.get("num_graphs", np.asarray(batch.num_graphs)))
        total_loss += float(metrics["loss"]) * num_graphs
        total_graphs += num_graphs
        results.append(metrics)
    elapsed = max(time.time() - start, 1e-9)
    return total_loss / max(total_graphs, 1), total_graphs / elapsed, results


def train_loop(
    model: GraphTaskModel,
    state: TrainState,
    train_step,
    eval_step,
    dataset: GraphDataset,
    max_epochs: int,
    patience: int,
    log_fun: Callable[[str], None] = print,
    save_model_fun: Optional[Callable[[TrainState], None]] = None,
    epoch_metrics_fn: Optional[Callable] = None,
    quiet: bool = True,
    metrics_logger=None,
) -> Tuple[TrainState, float]:
    """Best-validation-metric training loop with early stopping.

    Mirrors the reference train_loop (cli_utils/training_utils.py:40-100):
    initial validation eval, save at start and on every improvement, stop
    after ``patience`` epochs without improvement. Returns the final state and
    the best validation metric (lower is better).
    """
    if epoch_metrics_fn is None:
        epoch_metrics_fn = model.compute_epoch_metrics

    _, _, initial_results = run_eval_epoch(
        eval_step, state.params, dataset.batch_iterator(DataFold.VALIDATION)
    )
    best_metric, best_str = epoch_metrics_fn(initial_results)
    log_fun(f"Initial valid metric: {best_str}.")
    if save_model_fun is not None:
        save_model_fun(state)
    best_epoch = 0
    train_start = time.time()

    for epoch in range(1, max_epochs + 1):
        log_fun(f"== Epoch {epoch}")
        state, train_loss, train_speed, train_results = run_train_epoch(
            train_step, state, dataset.batch_iterator(DataFold.TRAIN), quiet=quiet,
            log_fun=log_fun,
        )
        train_metric, train_metric_str = epoch_metrics_fn(train_results)
        log_fun(
            f" Train:  {train_loss:.4f} loss | {train_metric_str} | "
            f"{train_speed:.2f} graphs/s"
        )
        if metrics_logger is not None:
            metrics_logger.log_epoch(epoch, "train", train_loss, train_metric,
                                     train_metric_str, train_speed)
        valid_loss, valid_speed, valid_results = run_eval_epoch(
            eval_step, state.params, dataset.batch_iterator(DataFold.VALIDATION)
        )
        valid_metric, valid_metric_str = epoch_metrics_fn(valid_results)
        log_fun(
            f" Valid:  {valid_loss:.4f} loss | {valid_metric_str} | "
            f"{valid_speed:.2f} graphs/s"
        )
        if metrics_logger is not None:
            metrics_logger.log_epoch(epoch, "valid", valid_loss, valid_metric,
                                     valid_metric_str, valid_speed)

        if valid_metric < best_metric:
            log_fun(
                f"  (Best epoch so far, target metric decreased to "
                f"{valid_metric:.5f} from {best_metric:.5f}.)"
            )
            if save_model_fun is not None:
                save_model_fun(state)
            best_metric = valid_metric
            best_epoch = epoch
        elif epoch - best_epoch >= patience:
            total = time.time() - train_start
            log_fun(
                f"Stopping training after {patience} epochs without improvement "
                f"on validation metric."
            )
            log_fun(f"Training took {total:.0f}s. Best validation metric: {best_metric}")
            break

    return state, best_metric


def build_training(
    model: GraphTaskModel,
    params: Dict[str, Any],
    example_batch: GraphBatch,
    seed: int = 0,
):
    """Convenience: optimizer + state + jitted steps in one call."""
    optimizer = make_optimizer(params)
    state = create_train_state(model, example_batch, optimizer, seed=seed)
    return state, make_train_step(model, optimizer), make_eval_step(model)
