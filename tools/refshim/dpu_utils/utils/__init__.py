"""Local-filesystem RichPath + iterator/debug helpers (dpu-utils surface).

Reference call sites: data/graph_dataset.py:7 (RichPath, DoubleBufferedIterator),
cli/train.py:5 (run_and_debug), data/*_dataset.py (RichPath.join/exists/
read_by_file_suffix), test/data/test_datasets.py:57 (save_as_compressed_file).
Azure paths are intentionally unsupported (local parity runs only).
"""
import gzip
import json
import pdb
import pickle
import queue
import sys
import threading
import traceback
from os import path as osp

import numpy as np


class RichPath:
    """Local-only RichPath: a thin pathlib-ish wrapper with typed readers."""

    def __init__(self, path: str):
        self._path = str(path)

    @staticmethod
    def create(path, azure_info_path=None):
        if str(path).startswith("azure://"):
            raise ValueError("refshim RichPath supports local paths only")
        return RichPath(path)

    @property
    def path(self) -> str:
        return self._path

    def __str__(self):
        return self._path

    def __repr__(self):
        return f"RichPath({self._path!r})"

    def __fspath__(self):
        return self._path

    def join(self, filename: str) -> "RichPath":
        return RichPath(osp.join(self._path, filename))

    def exists(self) -> bool:
        return osp.exists(self._path)

    def is_dir(self) -> bool:
        return osp.isdir(self._path)

    def basename(self) -> str:
        return osp.basename(self._path)

    def to_local_path(self) -> "RichPath":
        return self

    def read_by_file_suffix(self):
        p = self._path
        if p.endswith(".jsonl.gz"):
            return self._iter_jsonl_gz()
        if p.endswith(".json.gz"):
            with gzip.open(p, "rt", encoding="utf-8") as f:
                return json.load(f)
        if p.endswith(".json"):
            with open(p, "rt", encoding="utf-8") as f:
                return json.load(f)
        if p.endswith(".pkl.gz"):
            with gzip.open(p, "rb") as f:
                return pickle.load(f)
        if p.endswith(".npy") or p.endswith(".npz"):
            return np.load(p, allow_pickle=True)
        raise ValueError(f"Unknown file suffix for reading: {p}")

    def _iter_jsonl_gz(self):
        with gzip.open(self._path, "rt", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)

    def save_as_compressed_file(self, data) -> None:
        p = self._path
        if p.endswith(".jsonl.gz"):
            with gzip.open(p, "wt", encoding="utf-8") as f:
                for element in data:
                    f.write(json.dumps(element) + "\n")
        elif p.endswith(".pkl.gz"):
            with gzip.open(p, "wb") as f:
                pickle.dump(data, f)
        elif p.endswith(".json.gz"):
            with gzip.open(p, "wt", encoding="utf-8") as f:
                json.dump(data, f)
        else:
            raise ValueError(f"Unknown file suffix for writing: {p}")


class LocalPath(RichPath):
    pass


class DoubleBufferedIterator:
    """Background-thread prefetch wrapper around an iterator.

    Matches dpu-utils semantics used at reference data/graph_dataset.py:292-295:
    iteration order preserved, exceptions re-raised in the consumer thread.
    """

    _SENTINEL = object()

    def __init__(self, inner):
        self._queue: "queue.Queue" = queue.Queue(maxsize=3)
        self._thread = threading.Thread(
            target=self._worker, args=(iter(inner),), daemon=True
        )
        self._thread.start()

    def _worker(self, it):
        try:
            for element in it:
                self._queue.put((False, element))
        except Exception:  # noqa: BLE001 - relayed to consumer
            self._queue.put((True, sys.exc_info()[1]))
        finally:
            self._queue.put((False, self._SENTINEL))

    def __iter__(self):
        return self

    def __next__(self):
        is_error, element = self._queue.get()
        if is_error:
            raise element
        if element is self._SENTINEL:
            raise StopIteration
        return element


def run_and_debug(func, enable_debugging: bool = False) -> None:
    """pdb-on-exception wrapper (reference cli/train.py:32-34)."""
    try:
        func()
    except Exception:  # noqa: BLE001
        if enable_debugging:
            traceback.print_exc()
            pdb.post_mortem()
        else:
            raise
