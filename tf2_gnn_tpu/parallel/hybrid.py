"""Hybrid 2-D parallelism: data-parallel replicas of node-partitioned graphs.

Mesh ("data", "nodes"): each data-parallel replica owns one giant graph that
is itself node-partitioned across the "nodes" axis (parallel/spmd.py). Per
step every (replica, shard) device runs its local slice; graph/loss
reductions psum over "nodes" inside the model (GraphBatch.spmd_axis), the
completed per-replica gradients pmean over "nodes" (see spmd.py on the
transpose(psum) factor), and finally the replica gradients combine
graph-count-weighted over "data" — the 2-D composition of both 1-D schemes.
"""
from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..data.graph_batch import GraphBatch
from ..harness.training import TrainState
from .data_parallel import _combine_metrics, _squeeze_leading


def make_hybrid_mesh(
    num_replicas: int,
    shards_per_replica: int,
    devices: Sequence[jax.Device] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    needed = num_replicas * shards_per_replica
    if len(devices) < needed:
        raise ValueError(
            f"Need {needed} devices for a {num_replicas}x{shards_per_replica} "
            f"mesh, have {len(devices)}."
        )
    grid = np.asarray(devices[:needed]).reshape(num_replicas, shards_per_replica)
    return Mesh(grid, ("data", "nodes"))


def stack_partitioned_batches(
    batches: Sequence[GraphBatch], labels: Sequence[Dict[str, np.ndarray]]
) -> Tuple[GraphBatch, Dict[str, np.ndarray]]:
    """Stack per-replica partitioned batches (each already carrying a leading
    "nodes"-shard axis from partition_graph) on a new leading "data" axis.

    Replicas must share their STATIC batch structure — halo wire form and
    slab sizes, plan shapes, reorder outcome. Per-replica graph content can
    make those diverge (e.g. ``reorder="auto"`` engaging on one replica
    only, or ring slabs sized by each replica's boundary); pin the
    partitioner's choices (``halo="dense"``/``"ring"``, ``reorder=False``)
    or pad to shared budgets when feeding a hybrid mesh.
    """
    def _leaf_sig(b):
        # treedefs don't encode leaf shapes/dtypes, so compare those too —
        # diverging ext slab or plan shapes must fail HERE with the field
        # path, not later inside np.stack (advisor r4).
        leaves, treedef = jax.tree_util.tree_flatten_with_path(b)
        return treedef, [(jax.tree_util.keystr(path), np.shape(leaf),
                          np.asarray(leaf).dtype)
                         for path, leaf in leaves]

    ref_treedef, ref_leaves = _leaf_sig(batches[0])
    for i, b in enumerate(batches[1:], start=1):
        treedef, leaves = _leaf_sig(b)
        mismatch = None
        if treedef != ref_treedef:
            mismatch = "tree structure (halo form / plan presence)"
        else:
            for (path, shape, dtype), (_, rshape, rdtype) in zip(
                    leaves, ref_leaves):
                if shape != rshape or dtype != rdtype:
                    mismatch = (f"leaf {path}: {shape}/{dtype} vs replica "
                                f"0's {rshape}/{rdtype}")
                    break
        if mismatch is not None:
            raise ValueError(
                "stack_partitioned_batches: replica 0 and replica "
                f"{i} have different STATIC batch structure — {mismatch}. "
                "Partition every replica with pinned choices — e.g. "
                'halo="dense" or halo="ring", reorder=False — so the '
                "stacked [replica, shard, ...] arrays are uniform."
            )
    stacked_batch = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)
    stacked_labels = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *labels)
    return stacked_batch, stacked_labels


def make_hybrid_train_step(model, optimizer, mesh: Mesh):
    """(TrainState, batch [R, S, ...], labels) -> (TrainState, metrics)."""

    def per_device(params, rng, batch, labels):
        # Strip both leading singleton mesh dims.
        batch = _squeeze_leading(_squeeze_leading(batch))
        labels = _squeeze_leading(_squeeze_leading(labels))
        replica = jax.lax.axis_index("data")
        shard = jax.lax.axis_index("nodes")
        dropout_rng = jax.random.fold_in(jax.random.fold_in(rng, replica), shard)

        def loss_fn(p):
            task_output = model.apply(
                {"params": p}, batch, True, rngs={"dropout": dropout_rng}
            )
            metrics = model.compute_task_metrics(batch, task_output, labels)
            return metrics["loss"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        # Complete the replica's partial gradients over its node shards
        # (pmean: per-shard loss is the replicated global loss and
        # transpose(psum) contributes a uniform axis-size factor).
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "nodes"), grads)
        # Combine replicas graph-count-weighted over "data".
        local_graphs = batch.num_graphs.astype(jnp.float32)
        total = jax.lax.psum(local_graphs, "data")
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g * local_graphs, "data")
            / jnp.maximum(total, 1.0),
            grads,
        )
        metrics = _combine_metrics(metrics, "data", local_graphs)
        return grads, metrics

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data", "nodes"), P("data", "nodes")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: GraphBatch, labels):
        next_rng, dropout_rng = jax.random.split(state.rng)
        grads, metrics = sharded(state.params, dropout_rng, batch, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                       rng=next_rng),
            metrics,
        )

    return train_step
