"""Background-thread batch prefetching.

Equivalent of dpu-utils' ``DoubleBufferedIterator`` used by the reference's
data pipeline (tf2_gnn/data/graph_dataset.py:292-297): batch assembly (pack +
pad, the host-side hot loop) runs in a worker thread while the previous batch
trains on device. A bounded queue provides the double buffering.
"""
import queue
import threading
from typing import Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class PrefetchIterator:
    """Wrap an iterator; items are produced ahead of time in a daemon thread.

    ``buffer_size`` bounds how far ahead the producer runs (default 3,
    matching the reference's ``.prefetch(3)`` tf.data setting,
    cli_utils/training_utils.py:114-115). Exceptions in the producer are
    re-raised in the consumer.
    """

    def __init__(self, source: Iterator[T], buffer_size: int = 3):
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._error = None
        self._thread = threading.Thread(
            target=self._produce, args=(source,), daemon=True
        )
        self._thread.start()

    def _produce(self, source):
        try:
            for item in source:
                self._queue.put(item)
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            self._error = e
        finally:
            self._queue.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch(source: Iterator[T], buffer_size: int = 3) -> Iterator[T]:
    return PrefetchIterator(source, buffer_size=buffer_size)
