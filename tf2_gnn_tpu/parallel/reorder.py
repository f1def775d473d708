"""Locality-aware node reordering for giant-graph partitioning.

The METIS analog of the stack (SURVEY §2.4 item 1 / §5.7): ``partition_graph``
cuts CONTIGUOUS node ranges, so its boundary volume — and therefore the halo
exchange bytes and the ring wire form's win — is entirely determined by how
local the node ids are. Graphs that arrive with scattered ids (random
labelling, hash-ordered loaders) partition terribly; a reverse Cuthill-McKee
pass over the undirected union of all edge types relabels them so neighbours
get nearby ids, which simultaneously

* shrinks every shard's boundary row count (halo bytes scale with it),
* concentrates the active ring distances near +-1 (the per-distance
  ppermute form wins), and
* improves the pair/scatter kernels' block locality (fewer block pairs).

RCM is the right tool here rather than a KL/METIS bisection: partitioning is
into CONTIGUOUS RANGES of the new ordering, so what matters is bandwidth
reduction (all edges near the diagonal), which is exactly RCM's objective.
Runs in the native engine (graphpack.cc::gp_rcm_order) with a byte-identical
numpy fallback.

Usage::

    perm = locality_reorder(adjacency_lists, num_nodes)
    nf, adj, n2g, labels = apply_node_permutation(perm, nf, adj, n2g, labels)
    batch, labels = partition_graph(nf, adj, n2g, ...)
    # per-node outputs come back in the NEW order; restore with
    # out_old = out_new[invert_permutation(perm)[old_ids]] — see
    # invert_permutation below.
"""
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _rcm_numpy(num_nodes: int, deg: np.ndarray, indptr: np.ndarray,
               indices: np.ndarray) -> np.ndarray:
    perm = np.empty(num_nodes, np.int32)
    seen = np.zeros(num_nodes, bool)
    pos = 0
    for start in np.argsort(deg, kind="stable"):
        if seen[start]:
            continue
        seen[start] = True
        perm[pos] = start
        head = pos
        pos += 1
        while head < pos:
            u = perm[head]
            head += 1
            nb = indices[indptr[u]:indptr[u + 1]]
            nb = np.unique(nb[~seen[nb]])  # dedupe parallel edges, id-sorted
            if nb.size:
                nb = nb[np.argsort(deg[nb], kind="stable")]  # (deg, id) order
                seen[nb] = True
                perm[pos:pos + nb.size] = nb
                pos += nb.size
    return perm[::-1].copy()


def locality_reorder(adjacency_lists: Sequence[np.ndarray],
                     num_nodes: int) -> np.ndarray:
    """Reverse Cuthill-McKee permutation over the union of all edge types.

    Returns ``perm`` (int32 [num_nodes]) listing OLD node ids in the new
    order: new position i holds old node ``perm[i]``.
    """
    parts = [np.asarray(a, np.int32).reshape(-1, 2)
             for a in adjacency_lists if np.asarray(a).size]
    edges = (np.ascontiguousarray(np.concatenate(parts, axis=0))
             if parts else np.zeros((0, 2), np.int32))
    from ..native import rcm_order

    perm = rcm_order(edges, num_nodes)
    if perm is not None:
        return perm
    # numpy fallback — identical semantics (equivalence-tested).
    mask = edges[:, 0] != edges[:, 1]
    und = np.concatenate([edges[mask], edges[mask][:, ::-1]], axis=0)
    deg = np.bincount(und[:, 0], minlength=num_nodes).astype(np.int64)
    order = np.argsort(und[:, 0], kind="stable")
    indices = und[order, 1].astype(np.int32)
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    return _rcm_numpy(num_nodes, deg, indptr, indices)


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    """``inv[old_id] = new position`` — index per-node outputs of the
    reordered run with ``out_new[inv]`` to restore the original order."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


def apply_node_permutation(
    perm: np.ndarray,
    node_features: np.ndarray,
    adjacency_lists: Sequence[np.ndarray],
    node_to_graph: np.ndarray,
    node_labels: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[np.ndarray, List[np.ndarray], np.ndarray,
           Optional[Dict[str, np.ndarray]]]:
    """Relabel a graph's node ids by ``perm`` (rows AND edge endpoints)."""
    inv = invert_permutation(perm)
    adj = [inv[np.asarray(a, np.int32).reshape(-1, 2)]
           for a in adjacency_lists]
    labels = None
    if node_labels is not None:
        labels = {k: v[perm] for k, v in node_labels.items()}
    return node_features[perm], adj, node_to_graph[perm], labels
