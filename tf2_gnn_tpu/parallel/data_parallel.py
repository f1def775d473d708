"""Data parallelism over whole graphs (pjit/shard_map over a device mesh).

The GNN analog of batch data parallelism (SURVEY.md §2.4 item 3): the host
packs one padded mega-batch per device, stacks them on a leading mesh axis,
and a ``shard_map``-ed step computes per-device gradients that are
``pmean``-ed over ICI. Parameters and optimizer state stay replicated.

The reference has no distributed execution at all
(tf2_gnn/models/graph_task_model.py:367-398 is a plain single-device loop);
this module is designed from the mesh down, not ported.
"""
from functools import partial
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..data.graph_batch import GraphBatch
from ..harness.training import TrainState

# Metric keys that are additive counts -> psum; everything else is treated as
# a per-batch mean -> weighted by the shard's real graph count.
_ADDITIVE_PREFIXES = ("num_", "batch_")


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def stack_batches(
    batches: Sequence[GraphBatch], labels: Sequence[Dict[str, np.ndarray]]
) -> Tuple[GraphBatch, Dict[str, np.ndarray]]:
    """Stack per-device (batch, labels) pytrees along a new leading mesh axis.

    All batches must share the same PaddingConfig-derived static shapes (the
    batcher guarantees this per fold).
    """
    if not batches:
        raise ValueError("Need at least one batch to stack.")
    stacked_batch = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)
    stacked_labels = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *labels)
    return stacked_batch, stacked_labels


def shard_batches(
    batch_iter: Iterable[Tuple[GraphBatch, Dict[str, np.ndarray]]],
    num_shards: int,
) -> Iterator[Tuple[GraphBatch, Dict[str, np.ndarray]]]:
    """Group a single-device batch stream into stacked num_shards-wide steps.

    A trailing partial group is dropped (its graphs reappear next epoch in
    shuffled order), mirroring standard DP semantics.
    """
    group: List[Tuple[GraphBatch, Dict[str, np.ndarray]]] = []
    for item in batch_iter:
        group.append(item)
        if len(group) == num_shards:
            yield stack_batches([b for b, _ in group], [l for _, l in group])
            group = []


def _combine_metrics(metrics: Dict[str, jnp.ndarray], axis_name: str,
                     local_graphs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Reduce per-shard metric dicts into global ones.

    Count-like keys are summed; mean-like keys (loss, accuracy, f1, ...) are
    combined as a graph-count-weighted mean so the result equals what a
    single device would have computed on the concatenated batch.
    """
    total_graphs = jax.lax.psum(local_graphs, axis_name)
    out = {}
    for key, value in metrics.items():
        if key.startswith(_ADDITIVE_PREFIXES):
            out[key] = jax.lax.psum(value, axis_name)
        else:
            out[key] = (
                jax.lax.psum(value * local_graphs, axis_name)
                / jnp.maximum(total_graphs, 1.0)
            )
    return out


def _squeeze_leading(tree):
    return jax.tree.map(lambda x: x[0], tree)


def make_dp_train_step(model, optimizer, mesh: Mesh, axis_name: str = "data"):
    """Build a jitted data-parallel train step over ``mesh``.

    Takes (TrainState, stacked GraphBatch [ndev, ...], stacked labels) and
    returns (TrainState, metrics). Parameters/optimizer state are replicated;
    gradients are pmean-ed over the mesh axis (rides ICI on a TPU slice).
    """

    def per_shard(params, rng, batch, labels):
        batch = _squeeze_leading(batch)
        labels = _squeeze_leading(labels)
        dropout_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def loss_fn(p):
            task_output = model.apply(
                {"params": p}, batch, True, rngs={"dropout": dropout_rng}
            )
            metrics = model.compute_task_metrics(batch, task_output, labels)
            return metrics["loss"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        local_graphs = batch.num_graphs.astype(jnp.float32)
        # Weight gradients like the metrics: every graph counts equally.
        total = jax.lax.psum(local_graphs, axis_name)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g * local_graphs, axis_name)
            / jnp.maximum(total, 1.0),
            grads,
        )
        metrics = _combine_metrics(metrics, axis_name, local_graphs)
        return grads, metrics

    # check_vma=False: classic manual mode. With VMA tracking on, jax inserts
    # automatic psums on cotangents of replicated (P()) params inside the body
    # which double-counts with the explicit graph-weighted psum below.
    sharded_grads = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: GraphBatch, labels):
        next_rng, dropout_rng = jax.random.split(state.rng)
        grads, metrics = sharded_grads(state.params, dropout_rng, batch, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=next_rng
        )
        return new_state, metrics

    return train_step


def make_dp_eval_step(model, mesh: Mesh, axis_name: str = "data"):
    """Jitted data-parallel eval step: (params, stacked batch, labels) -> metrics."""

    def per_shard(params, batch, labels):
        batch = _squeeze_leading(batch)
        labels = _squeeze_leading(labels)
        task_output = model.apply({"params": params}, batch, False)
        metrics = model.compute_task_metrics(batch, task_output, labels)
        return _combine_metrics(
            metrics, axis_name, batch.num_graphs.astype(jnp.float32)
        )

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
