"""ctypes bindings for the native host-side data engine (libgraphpack).

C++ source: native/src/graphpack.cc. The library is built on demand with the
in-repo Makefile (a ~1s g++ compile) and cached; every entry point has a pure
numpy fallback so the package works without a toolchain. ``available()``
reports which path is active.
"""
import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent / "libgraphpack.so"
_MAKE_DIR = Path(__file__).parent.parent.parent / "native"
_lib = None
_tried = False

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    if not (_MAKE_DIR / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_MAKE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _stale() -> bool:
    """True when the built library predates the C++ source (a checkout that
    built at an older commit and then pulled new engine entry points)."""
    src = _MAKE_DIR / "src" / "graphpack.cc"
    try:
        return src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    except OSError:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not _LIB_PATH.exists() or _stale()) and not _build():
        if not _LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        return _wire(lib)
    except (OSError, AttributeError):
        # Unloadable or missing a symbol (stale binary without a working
        # toolchain to rebuild): degrade to the numpy fallbacks.
        return None


def _wire(lib):
    global _lib
    lib.gp_expand_edges.restype = ctypes.c_int64
    lib.gp_expand_edges.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int, _i32p]
    lib.gp_flip_edges.restype = None
    lib.gp_flip_edges.argtypes = [_i32p, ctypes.c_int64, _i32p]
    lib.gp_self_loops.restype = None
    lib.gp_self_loops.argtypes = [ctypes.c_int64, _i32p]
    lib.gp_in_degrees.restype = None
    lib.gp_in_degrees.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int64, _f64p]
    lib.gp_pack_nodes.restype = None
    lib.gp_pack_nodes.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), _i32p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, _f32p, _i32p,
    ]
    lib.gp_pack_edges.restype = ctypes.c_int64
    lib.gp_pack_edges.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
        _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, _i32p, _i32p,
    ]
    lib.gp_pack_labels.restype = None
    lib.gp_pack_labels.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), _i32p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, _f32p,
    ]
    lib.gp_sort_by_target.restype = None
    lib.gp_sort_by_target.argtypes = [
        _i32p, _i32p, ctypes.c_int64, _i32p, _i32p, _i32p,
    ]
    lib.gp_scatter_plan.restype = ctypes.c_int64
    lib.gp_scatter_plan.argtypes = [
        _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _i32p, _i32p, _i32p,
    ]
    lib.gp_pair_plan.restype = ctypes.c_int64
    lib.gp_pair_plan.argtypes = [
        _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, _i32p, _i32p, _i32p, _i32p,
        np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.gp_pair_plan_count.restype = ctypes.c_int64
    lib.gp_pair_plan_count.argtypes = [
        _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.gp_rcm_order.restype = None
    lib.gp_rcm_order.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int64, _i32p]
    _lib = lib
    return _lib


def _reset_for_tests():
    """Drop the cached library so tests can force reload/fallback paths."""
    global _lib, _tried
    _lib = None
    _tried = False


def available() -> bool:
    """True when the native library is loaded (or loadable)."""
    return _load() is not None


def _ptr_array(arrays: Sequence[np.ndarray]):
    ptrs = (ctypes.c_void_p * len(arrays))()
    for i, a in enumerate(arrays):
        ptrs[i] = a.ctypes.data_as(ctypes.c_void_p).value
    return ptrs


# ---------------------------------------------------------------------------
# Public operations (native with numpy fallback).

def pack_nodes(
    features: Sequence[np.ndarray],
    v_pad: int,
    pad_graph_id: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate per-graph node features into a zero-padded [v_pad, D]
    buffer + the node->graph map (pads -> pad_graph_id)."""
    features = [np.ascontiguousarray(f, dtype=np.float32) for f in features]
    feat_dim = features[0].shape[1]
    counts = np.asarray([f.shape[0] for f in features], dtype=np.int32)
    out = np.empty((v_pad, feat_dim), dtype=np.float32)
    n2g = np.empty((v_pad,), dtype=np.int32)
    lib = _load()
    if lib is not None:
        lib.gp_pack_nodes(
            _ptr_array(features), counts, len(features), feat_dim, v_pad,
            pad_graph_id, out, n2g,
        )
        return out, n2g
    total = int(counts.sum())
    out[:total] = np.concatenate(features, axis=0)
    out[total:] = 0.0
    n2g[:total] = np.repeat(np.arange(len(features), dtype=np.int32), counts)
    n2g[total:] = pad_graph_id
    return out, n2g


def pack_edges(
    edges: Sequence[np.ndarray],
    graph_num_nodes: Sequence[int],
    budget: int,
    pad_node: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Concatenate one edge type across graphs with node-index offsets into
    padded (src, tgt) arrays. Returns (src, tgt, real_count)."""
    edges = [np.ascontiguousarray(e, dtype=np.int32).reshape(-1, 2) for e in edges]
    counts = np.asarray([e.shape[0] for e in edges], dtype=np.int64)
    nodes = np.asarray(graph_num_nodes, dtype=np.int32)
    src = np.empty((budget,), dtype=np.int32)
    tgt = np.empty((budget,), dtype=np.int32)
    lib = _load()
    if lib is not None:
        written = lib.gp_pack_edges(
            _ptr_array(edges), counts, nodes, len(edges), budget, pad_node,
            src, tgt,
        )
        if written < 0:
            raise ValueError(f"Edge budget {budget} overflowed while packing.")
        return src, tgt, int(written)
    offsets = np.concatenate([[0], np.cumsum(nodes[:-1])])
    pieces = [e + off for e, off in zip(edges, offsets) if e.shape[0]]
    flat = (np.concatenate(pieces, axis=0) if pieces
            else np.zeros((0, 2), dtype=np.int32))
    if flat.shape[0] > budget:
        raise ValueError(f"Edge budget {budget} overflowed while packing.")
    src[: flat.shape[0]] = flat[:, 0]
    tgt[: flat.shape[0]] = flat[:, 1]
    src[flat.shape[0]:] = pad_node
    tgt[flat.shape[0]:] = pad_node
    return src, tgt, flat.shape[0]


def pack_labels(
    labels: Sequence[np.ndarray], rows_pad: int
) -> np.ndarray:
    """Concatenate per-graph float32 label arrays, zero-padded to rows_pad."""
    labels = [np.ascontiguousarray(l, dtype=np.float32) for l in labels]
    labels2d = [l.reshape(l.shape[0], -1) for l in labels]
    cols = labels2d[0].shape[1]
    counts = np.asarray([l.shape[0] for l in labels2d], dtype=np.int32)
    out = np.empty((rows_pad, cols), dtype=np.float32)
    lib = _load()
    if lib is not None:
        lib.gp_pack_labels(_ptr_array(labels2d), counts, len(labels2d), cols,
                           rows_pad, out)
    else:
        total = int(counts.sum())
        out[:total] = np.concatenate(labels2d, axis=0)
        out[total:] = 0.0
    trailing = labels[0].shape[1:] if labels[0].ndim > 1 else ()
    return out.reshape((rows_pad,) + trailing) if trailing else out[:, 0]


def sort_by_target(
    src: np.ndarray, tgt: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stable-sort an edge list by target; returns (src', tgt', permutation)."""
    src = np.ascontiguousarray(src, dtype=np.int32)
    tgt = np.ascontiguousarray(tgt, dtype=np.int32)
    n = src.shape[0]
    src_out = np.empty_like(src)
    tgt_out = np.empty_like(tgt)
    perm = np.empty((n,), dtype=np.int32)
    lib = _load()
    if lib is not None:
        lib.gp_sort_by_target(src, tgt, n, src_out, tgt_out, perm)
        return src_out, tgt_out, perm
    order = np.argsort(tgt, kind="stable").astype(np.int32)
    return src[order], tgt[order], order


def scatter_plan(sorted_vals: np.ndarray, order: np.ndarray, num_chunks: int,
                 chunk_edges: int, block_nodes: int, perm: np.ndarray,
                 rel: np.ndarray, block_ids: np.ndarray) -> Optional[int]:
    """Native chunked scatter planner; returns chunks used (or -1 on
    overflow), or None when the native library is unavailable (caller falls
    back to the Python planner)."""
    lib = _load()
    if lib is None:
        return None
    return int(
        lib.gp_scatter_plan(
            np.ascontiguousarray(sorted_vals, dtype=np.int32),
            np.ascontiguousarray(order, dtype=np.int32),
            sorted_vals.shape[0], num_chunks, chunk_edges, block_nodes,
            perm, rel, block_ids,
        )
    )


def pair_plan(src: np.ndarray, tgt: np.ndarray, budget: int, group: int,
              blk: int, e_c: int):
    """Native block-pair planner for one direction (no-spill fast path).

    Returns (chunks_used, rel_src, rel_tgt, src_blk, tgt_blk, edge_slot)
    with chunks_used == -1 on budget overflow, or None when the native
    library is unavailable — in both cases the caller runs the numpy
    planner (which also handles spilling)."""
    lib = _load()
    if lib is None:
        return None
    n = int(src.shape[0])
    src = np.ascontiguousarray(src, dtype=np.int32)
    tgt = np.ascontiguousarray(tgt, dtype=np.int32)
    rel_src = np.empty((budget * e_c,), np.int32)
    rel_tgt = np.empty((budget * e_c,), np.int32)
    src_blk = np.empty((budget,), np.int32)
    tgt_blk = np.empty((budget,), np.int32)
    edge_slot = np.empty((n,), np.int64)
    used = int(lib.gp_pair_plan(src, tgt, n, budget, group, blk, e_c,
                                rel_src, rel_tgt, src_blk, tgt_blk,
                                edge_slot))
    return used, rel_src, rel_tgt, src_blk, tgt_blk, edge_slot


def pair_plan_count(src: np.ndarray, tgt: np.ndarray, group: int, blk: int,
                    e_c: int) -> Optional[int]:
    """Run-aligned chunk total one pair-plan direction needs (count-only
    native twin of ``pair_plan``), or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.gp_pair_plan_count(
        np.ascontiguousarray(src, dtype=np.int32),
        np.ascontiguousarray(tgt, dtype=np.int32),
        int(src.shape[0]), group, blk, e_c))


def rcm_order(edges: np.ndarray, num_nodes: int) -> Optional[np.ndarray]:
    """Reverse Cuthill-McKee node permutation over the undirected union of
    ``edges`` (int32 [E, 2], all types concatenated), or None when the
    native library is unavailable (parallel/reorder.py falls back to the
    byte-identical numpy implementation)."""
    lib = _load()
    if lib is None or not hasattr(lib, "gp_rcm_order"):
        return None
    edges = np.ascontiguousarray(edges, dtype=np.int32).reshape(-1, 2)
    perm = np.empty((num_nodes,), dtype=np.int32)
    lib.gp_rcm_order(edges, edges.shape[0], num_nodes, perm)
    return perm


def in_degrees(edges: np.ndarray, num_nodes: int) -> np.ndarray:
    """float64 [num_nodes] in-degree counts for one edge type."""
    edges = np.ascontiguousarray(edges, dtype=np.int32).reshape(-1, 2)
    out = np.empty((num_nodes,), dtype=np.float64)
    lib = _load()
    if lib is not None:
        lib.gp_in_degrees(edges, edges.shape[0], num_nodes, out)
        return out
    if edges.shape[0] == 0:
        out[:] = 0.0
        return out
    return np.bincount(edges[:, 1], minlength=num_nodes).astype(np.float64)
