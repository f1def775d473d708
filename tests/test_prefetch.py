"""Tests for the host-side prefetch iterator and the device staging pipeline.

Covers the reference's data-pipeline behaviour (worker-thread batch assembly
+ prefetch(3), tf2_gnn/data/graph_dataset.py:292-297 +
cli_utils/training_utils.py:114-115) as reimplemented in
tf2_gnn_tpu/data/prefetch.py and harness/training.py::device_prefetch.
"""
import time

import numpy as np
import pytest

from tf2_gnn_tpu.data.prefetch import PrefetchIterator, prefetch
from tf2_gnn_tpu.harness.training import device_prefetch


def test_prefetch_preserves_order_and_exhausts():
    assert list(prefetch(iter(range(100)), buffer_size=3)) == list(range(100))


def test_prefetch_empty_source():
    assert list(prefetch(iter(()))) == []


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), buffer_size=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_propagates_exception_even_when_queue_full():
    # Producer raises while the bounded queue is full -> the sentinel is
    # dropped; the error must still surface after the buffered items drain.
    def gen():
        yield from range(4)
        raise ValueError("late boom")

    it = PrefetchIterator(gen(), buffer_size=1)
    got = []
    with pytest.raises(ValueError, match="late boom"):
        for x in it:
            got.append(x)
            time.sleep(0.01)  # let the producer run ahead and die
    assert got == list(range(4))


def test_prefetch_close_unblocks_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), buffer_size=2)
    assert next(it) == 0
    it.close()
    deadline = time.time() + 5.0
    while it._thread.is_alive() and time.time() < deadline:
        time.sleep(0.01)
    assert not it._thread.is_alive()
    assert len(produced) < 100  # producer stopped early, not fully drained


def test_device_prefetch_order_and_values():
    items = [({"a": np.full((3,), i, np.float32)}, np.int32(i)) for i in range(7)]
    out = list(device_prefetch(iter(items), depth=2))
    assert len(out) == 7
    for i, (d, s) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(d["a"]), np.full((3,), i))
        assert int(np.asarray(s)) == i


def test_device_prefetch_shorter_than_depth():
    items = [np.arange(4)]
    out = list(device_prefetch(iter(items), depth=3))
    assert len(out) == 1
    np.testing.assert_array_equal(np.asarray(out[0]), np.arange(4))
