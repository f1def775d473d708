"""Small file-format helpers (local-filesystem RichPath equivalent).

The reference reads data through dpu-utils' RichPath
(``read_by_file_suffix`` over .json / .jsonl.gz / .npy / .pkl.gz). We support
the same suffixes with plain stdlib/numpy so datasets stay drop-in loadable.
"""
import gzip
import json
import pickle
from pathlib import Path
from typing import Any, Iterator, Union

import numpy as np

PathLike = Union[str, Path]


def read_by_file_suffix(path: PathLike) -> Any:
    if isinstance(path, str) and path.startswith("azure://"):
        # The reference reads azure:// URIs via dpu-utils' AzurePath
        # (tf2_gnn/data/graph_dataset.py:7). This framework is filesystem
        # only; stage the container locally (e.g. azcopy) and point at it.
        raise NotImplementedError(
            f"azure:// paths are not supported ({path}). Download the "
            "container to a local directory (e.g. with azcopy or "
            "azure-storage-blob) and pass that path instead."
        )
    path = Path(path)
    name = path.name
    if name.endswith(".jsonl.gz"):
        return list(iter_jsonl_gz(path))
    if name.endswith(".json.gz"):
        with gzip.open(path, "rt") as f:
            return json.load(f)
    if name.endswith(".json"):
        with open(path, "rt") as f:
            return json.load(f)
    if name.endswith(".jsonl"):
        with open(path, "rt") as f:
            return [json.loads(line) for line in f if line.strip()]
    if name.endswith(".npy"):
        return np.load(path, allow_pickle=True)
    if name.endswith(".pkl.gz"):
        with gzip.open(path, "rb") as f:
            return pickle.load(f)
    if name.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    raise ValueError(f"Unsupported file suffix for {path}")


def iter_jsonl_gz(path: PathLike) -> Iterator[Any]:
    with gzip.open(path, "rt") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def write_jsonl_gz(path: PathLike, records) -> None:
    with gzip.open(path, "wt") as f:
        for record in records:
            f.write(json.dumps(record) + "\n")
