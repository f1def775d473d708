"""Segment-op semantics vs plain numpy references.

Mirrors the role of the TF kernels the reference relies on
(tf.math.unsorted_segment_* and dpu-utils' unsorted_segment_(log_)softmax —
see SURVEY.md §2.4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.ops.segment import (
    gather_rows,
    get_aggregation_function,
    segment_log_softmax,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sqrt_n,
    segment_sum,
)


def _random_case(num_entries=37, num_segments=8, dim=5, seed=1):
    rng = np.random.RandomState(seed)
    data = rng.randn(num_entries, dim).astype(np.float32)
    ids = rng.randint(0, num_segments, size=num_entries).astype(np.int32)
    return data, ids, num_segments


def test_segment_sum_matches_numpy():
    data, ids, n = _random_case()
    out = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), n))
    expected = np.zeros((n, data.shape[1]), dtype=np.float32)
    np.add.at(expected, ids, data)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_segment_mean_matches_numpy_and_zero_for_empty():
    data, ids, _ = _random_case(num_segments=4)
    n = 6  # segments 4, 5 are empty
    out = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), n))
    for seg in range(4):
        np.testing.assert_allclose(
            out[seg], data[ids == seg].mean(axis=0), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_array_equal(out[4:], 0.0)


def test_segment_sqrt_n_matches_numpy():
    data, ids, n = _random_case()
    out = np.asarray(segment_sqrt_n(jnp.asarray(data), jnp.asarray(ids), n))
    for seg in range(n):
        members = data[ids == seg]
        if len(members):
            np.testing.assert_allclose(
                out[seg], members.sum(axis=0) / np.sqrt(len(members)),
                rtol=1e-5, atol=1e-6,
            )


def test_segment_max_matches_numpy_and_empty_value():
    data, ids, _ = _random_case(num_segments=4)
    n = 5
    out = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), n))
    for seg in range(4):
        np.testing.assert_allclose(out[seg], data[ids == seg].max(axis=0), rtol=1e-5)
    np.testing.assert_array_equal(out[4], 0.0)  # empty segment -> empty_value


def test_segment_softmax_normalises_per_segment():
    logits = jnp.asarray([1.0, 2.0, 3.0, 1.0, -1.0])
    ids = jnp.asarray([0, 0, 0, 1, 1], dtype=jnp.int32)
    out = np.asarray(segment_softmax(logits, ids, 3))
    np.testing.assert_allclose(out[:3].sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(out[3:].sum(), 1.0, atol=1e-5)
    # Matches dense softmax within each segment.
    np.testing.assert_allclose(
        out[:3], np.asarray(jax.nn.softmax(logits[:3])), atol=1e-5
    )


def test_segment_log_softmax_exp_equals_softmax_2d():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(20, 4).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 5, size=20).astype(np.int32))
    log_sm = np.asarray(segment_log_softmax(logits, ids, 6))
    sm = np.asarray(segment_softmax(logits, ids, 6))
    np.testing.assert_allclose(np.exp(log_sm), sm, atol=1e-5)
    # Per (segment, column) sums to 1 for non-empty segments.
    for seg in range(5):
        members = np.exp(log_sm)[np.asarray(ids) == seg]
        if len(members):
            np.testing.assert_allclose(members.sum(axis=0), np.ones(4), atol=1e-4)


def test_segment_softmax_extreme_logits_stable():
    logits = jnp.asarray([1000.0, 1000.0, -1000.0])
    ids = jnp.asarray([0, 0, 0], dtype=jnp.int32)
    out = np.asarray(segment_softmax(logits, ids, 1))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, [0.5, 0.5, 0.0], atol=1e-5)


def test_empty_segments_in_softmax_do_not_nan():
    logits = jnp.asarray([1.0, 2.0])
    ids = jnp.asarray([0, 0], dtype=jnp.int32)
    out = np.asarray(segment_softmax(logits, ids, 4))
    assert np.all(np.isfinite(out))


def test_aggregation_registry():
    for name in ("sum", "mean", "max", "sqrt_n"):
        assert callable(get_aggregation_function(name))
    with pytest.raises(ValueError):
        get_aggregation_function("nope")


def test_gather_rows_forward_and_dense_gradient():
    params = jnp.asarray(np.random.randn(6, 3).astype(np.float32))
    indices = jnp.asarray([0, 0, 2, 5], dtype=jnp.int32)
    out = gather_rows(params, indices)
    np.testing.assert_allclose(np.asarray(out), np.asarray(params)[[0, 0, 2, 5]])

    def loss(p):
        return jnp.sum(gather_rows(p, indices) ** 2)

    grad = np.asarray(jax.grad(loss)(params))
    expected = np.zeros((6, 3), dtype=np.float32)
    np.add.at(expected, np.asarray(indices), 2 * np.asarray(params)[[0, 0, 2, 5]])
    np.testing.assert_allclose(grad, expected, rtol=1e-5, atol=1e-6)
    # Dense gradient: untouched rows exactly zero.
    np.testing.assert_array_equal(grad[[1, 3, 4]], 0.0)
