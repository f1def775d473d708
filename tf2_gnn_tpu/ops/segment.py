"""Segment (scatter-reduce) primitives — the SpMM substrate of the framework.

These are the TPU-native equivalents of the TF kernels the reference leans on:
``tf.math.unsorted_segment_{sum,mean,max,sqrt_n}`` (reference call sites:
tf2_gnn/layers/message_passing/message_passing.py:166-179) and dpu-utils'
``unsorted_segment_softmax`` / ``unsorted_segment_log_softmax`` (used at
tf2_gnn/layers/message_passing/rgat.py:147-151 and
tf2_gnn/layers/nodes_to_graph_representation.py:180-185).

All functions require a *static* ``num_segments`` — the framework's batching
layer always pads node/graph counts to fixed budgets, so this is free.
XLA lowers these to efficient scatter-adds; a fused Pallas path for the
gather->transform->scatter hot loop lives in ``ops/spmm_pallas.py``.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.constants import SMALL_NUMBER


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                spmd_axis: Optional[str] = None) -> jnp.ndarray:
    """Sum of ``data`` rows per segment. Empty segments yield 0.

    ``spmd_axis``: when the rows of ``data`` are sharded over a mesh axis but
    the segments are global (e.g. per-graph readouts of a node-partitioned
    graph), the partial per-shard sums are psum-ed over ICI so every shard
    holds the replicated global result.

    >>> import jax.numpy as jnp
    >>> segment_sum(jnp.asarray([[1.0], [2.0], [4.0]]),
    ...             jnp.asarray([0, 0, 1]), 3).ravel().tolist()
    [3.0, 4.0, 0.0]
    """
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    if spmd_axis is not None:
        out = jax.lax.psum(out, spmd_axis)
    return out


def segment_count(segment_ids: jnp.ndarray, num_segments: int,
                  dtype=jnp.float32, spmd_axis: Optional[str] = None) -> jnp.ndarray:
    """Number of entries per segment (in-degree when ids are edge targets)."""
    return segment_sum(
        jnp.ones(segment_ids.shape, dtype=dtype), segment_ids,
        num_segments=num_segments, spmd_axis=spmd_axis,
    )


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 spmd_axis: Optional[str] = None) -> jnp.ndarray:
    """Mean per segment. Empty segments yield 0 (matching tf.unsorted_segment_mean)."""
    totals = segment_sum(data, segment_ids, num_segments, spmd_axis=spmd_axis)
    counts = segment_count(segment_ids, num_segments, dtype=totals.dtype,
                           spmd_axis=spmd_axis)
    counts = counts.reshape(counts.shape + (1,) * (totals.ndim - 1))
    return totals / jnp.maximum(counts, 1.0)


def segment_sqrt_n(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum per segment divided by sqrt(segment size) (tf.unsorted_segment_sqrt_n)."""
    totals = segment_sum(data, segment_ids, num_segments)
    counts = segment_count(segment_ids, num_segments, dtype=totals.dtype)
    counts = counts.reshape(counts.shape + (1,) * (totals.ndim - 1))
    return totals / jnp.sqrt(jnp.maximum(counts, 1.0))


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                empty_value: float = 0.0) -> jnp.ndarray:
    """Max per segment.

    tf.math.unsorted_segment_max fills empty segments with dtype.min; the
    reference's models never consume empty-segment values for real nodes
    (graphs there always have self-loops when max aggregation matters), but to
    keep padded rows benign we replace empty-segment results with
    ``empty_value`` (default 0).
    """
    maxes = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    counts = segment_count(segment_ids, num_segments)
    counts = counts.reshape(counts.shape + (1,) * (maxes.ndim - 1))
    return jnp.where(counts > 0, maxes, jnp.asarray(empty_value, dtype=maxes.dtype))


def segment_logits_max(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int,
                       spmd_axis: Optional[str] = None) -> jnp.ndarray:
    """Per-segment max of logits, with empty segments pinned to 0 so that the
    downstream ``logits - max[ids]`` never produces NaN for padded entries."""
    # The max subtraction is a numerical-stability shift; softmax outputs are
    # invariant to it, so its true gradient contribution is zero. stop_gradient
    # encodes that exactly (and pmax has no differentiation rule anyway, so it
    # must see a primal-only value).
    maxes = jax.lax.stop_gradient(
        jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    )
    if spmd_axis is not None:
        maxes = jax.lax.pmax(maxes, spmd_axis)
    return jnp.where(jnp.isfinite(maxes), maxes, 0.0)


def segment_log_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                        num_segments: int,
                        spmd_axis: Optional[str] = None) -> jnp.ndarray:
    """Numerically-stable log-softmax within each segment.

    Matches dpu-utils' ``unsorted_segment_log_softmax`` semantics: per-segment
    max subtraction, exp, per-segment normalisation in log space.
    ``logits`` may be [M] or [M, K] (softmax is per segment per trailing col).
    """
    maxes = segment_logits_max(logits, segment_ids, num_segments, spmd_axis)
    shifted = logits - maxes[segment_ids]
    sum_exp = segment_sum(jnp.exp(shifted), segment_ids, num_segments,
                          spmd_axis=spmd_axis)
    log_norm = jnp.log(jnp.maximum(sum_exp, SMALL_NUMBER))
    return shifted - log_norm[segment_ids]


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int,
                    spmd_axis: Optional[str] = None) -> jnp.ndarray:
    """Numerically-stable softmax within each segment (dpu-utils
    ``unsorted_segment_softmax`` semantics: exp(x - max) / (sum + eps))."""
    maxes = segment_logits_max(logits, segment_ids, num_segments, spmd_axis)
    exp_shifted = jnp.exp(logits - maxes[segment_ids])
    denom = segment_sum(exp_shifted, segment_ids, num_segments,
                        spmd_axis=spmd_axis) + SMALL_NUMBER
    return exp_shifted / denom[segment_ids]


_AGGREGATORS = {
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "sqrt_n": segment_sqrt_n,
}


def get_aggregation_function(name: str):
    """Name -> segment aggregation fn (reference: utils/param_helpers.py:7-18)."""
    fn = _AGGREGATORS.get(name)
    if fn is None:
        raise ValueError(f"Unknown aggregation function: {name}")
    return fn


def get_known_aggregation_names():
    return sorted(_AGGREGATORS.keys())


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_rows(params: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Row gather with a dense scatter-add gradient.

    Functional analog of the reference's ``gather_dense_gradient``
    (tf2_gnn/utils/gather_dense_gradient.py:10-14). Under JAX the gradient of
    ``take`` is already a scatter-add, but routing through this op lets the
    Pallas backend swap in a fused kernel for both directions.

    Out-of-range indices CLAMP (mode='clip'), never fill with NaN: SPMD
    padded edge slots intentionally index the virtual discard row (one past
    the local node range); a NaN fill there would poison weight gradients
    through NaN*0 even though the forward discards those rows.
    """
    return jnp.take(params, indices, axis=0, mode="clip")


def _gather_rows_fwd(params, indices):
    return jnp.take(params, indices, axis=0, mode="clip"), (params.shape[0], indices)


def _gather_rows_bwd(res, g):
    num_rows, indices = res
    # Out-of-range ids (discard-row slots) are dropped by the scatter; their
    # cotangents are exactly zero anyway (the forward discards those rows).
    return jax.ops.segment_sum(g, indices, num_segments=num_rows), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
