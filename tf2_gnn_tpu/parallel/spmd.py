"""SPMD node-partitioned execution of one giant graph across a mesh.

The GNN analog of sequence/context parallelism (SURVEY.md §2.4 items 1-2,
§5.7): the reference's only scaling lever is its node-budget batcher
(tf2_gnn/data/graph_dataset.py:161-190, single device); here a graph too large
for one chip is *partitioned*:

* each shard owns a contiguous node range (features, labels, node states),
* each edge lives on the shard that owns its TARGET node; sources are global,
* per MP layer, shards exchange (transformed) node features over ICI via
  ``all_gather`` (XLA overlaps the collective with the dense node-space
  matmuls) and aggregate purely locally — padded edge slots scatter into a
  virtual per-shard discard row,
* graph-level readouts psum partial per-graph sums; per-node losses psum
  count/sum pairs (see GraphBatch.spmd_axis plumbing in the layers).

Gradients: each shard computes the partial gradient of the global loss
through its local terms (all_gather transposes to reduce-scatter), and a
final psum yields the exact full gradient on every shard.
"""
import math
import warnings
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..data.graph_batch import GraphBatch
from ..harness.training import TrainState
from ..utils.shapes import round_up as _round_up
from .data_parallel import _squeeze_leading


class ReorderEngaged(UserWarning):
    """partition_graph(reorder='auto') permuted the node order (see the
    ``reorder`` doc — route per-node outputs through restore_node_order)."""


def partition_graph(
    node_features: np.ndarray,
    adjacency_lists: Sequence[np.ndarray],
    node_to_graph: np.ndarray,
    num_graphs: int,
    num_shards: int,
    axis_name: str = "nodes",
    node_alignment: int = 8,
    edge_alignment: int = 64,
    node_labels: Optional[Dict[str, np.ndarray]] = None,
    graph_labels: Optional[Dict[str, np.ndarray]] = None,
    num_graphs_padded: Optional[int] = None,
    build_scatter_plans: bool = False,
    build_pair_plans: bool = False,
    pair_merge_targets: bool = False,
    pair_per_type: bool = False,
    halo="auto",
    reorder="auto",
) -> Tuple[GraphBatch, Dict[str, np.ndarray]]:
    """Host-side partitioner: giant graph -> stacked per-shard GraphBatch.

    Returns a GraphBatch whose array leaves carry a leading shard axis
    (feed through shard_map with in_specs P(axis_name)) plus stacked labels.
    ``edge_targets`` become local to the target's owning shard, with padded
    slots -> the discard row.

    With ``halo`` enabled (default ``"auto"``) the partitioner also plans
    the boundary-only exchange: per (owner, consumer) pair it lists the
    rows the consumer's edges actually reference, ``edge_sources`` are
    remapped to EXT-LOCAL ids into per-slab halo rows, and every MP layer
    moves only those boundary rows (bytes ~ boundary * D) instead of
    all_gathering the full node table (bytes ~ S * V * D). Two wire forms,
    chosen by byte count under ``"auto"`` (or forced with ``halo="dense"``
    / ``halo="ring"``): a dense all_to_all padded per (owner, consumer)
    pair, or one ppermute per active ring distance padded per DISTANCE —
    the win for locality-sorted graphs, where only neighbouring shards
    exchange. ``halo=False`` keeps GLOBAL source ids + the legacy
    per-layer all_gather.

    ``reorder`` applies the RCM locality pass (parallel/reorder.py) BEFORE
    cutting contiguous ranges: ``"auto"`` (default) relabels only when it
    strictly shrinks the boundary row count (graphs that arrive hash- or
    insertion-ordered but have latent community structure); ``True`` forces
    it; ``False`` disables it. When applied, node features / labels /
    node_to_graph are permuted consistently (losses and graph-level metrics
    are unaffected) and the returned batch carries ``node_restore`` — feed
    per-node OUTPUTS through ``restore_node_order(out, batch)`` to get them
    back in the caller's original node order. Because ``"auto"`` can engage
    without the caller asking, its engagement emits a ``ReorderEngaged``
    warning naming ``restore_node_order``; pass ``reorder=True`` (you know
    you restore) or ``reorder=False`` to silence it.
    """
    num_nodes = node_features.shape[0]
    if build_pair_plans and not halo:
        raise ValueError(
            "build_pair_plans requires a halo form (the pair kernels consume "
            "ext-local source ids; the legacy all_gather path has no ext row "
            "space). Use build_scatter_plans for halo=False."
        )
    if build_scatter_plans or build_pair_plans:
        # The Pallas kernels tile node rows in BLOCK_NODES blocks.
        from ..ops.spmm_pallas import BLOCK_NODES

        node_alignment = max(node_alignment, BLOCK_NODES)
    nodes_per_shard = _round_up(
        int(math.ceil(num_nodes / num_shards)), node_alignment
    )
    if num_graphs_padded is None:
        num_graphs_padded = num_graphs + 1

    node_restore = None
    if reorder and num_shards > 1:
        from .reorder import apply_node_permutation, locality_reorder

        perm = locality_reorder(adjacency_lists, num_nodes)
        if reorder == "auto":
            inv = np.empty((num_nodes,), np.int64)
            inv[perm] = np.arange(num_nodes)
            apply_it = (
                _boundary_row_count(adjacency_lists, nodes_per_shard, inv)
                < _boundary_row_count(adjacency_lists, nodes_per_shard, None)
            )
        else:
            apply_it = True
        if apply_it:
            if reorder == "auto":
                # The caller did not explicitly ask for a permuted node
                # order, so make the engagement impossible to miss
                # (advisor r4): per-node outputs/labels come back in RCM
                # order until restored.
                warnings.warn(
                    "partition_graph(reorder='auto') engaged RCM node "
                    "reordering (it shrinks the halo boundary for this "
                    "graph). Per-node outputs and returned node labels are "
                    "in the REORDERED layout; pass them through "
                    "restore_node_order(out, batch) to recover the input "
                    "node order. Silence with reorder=True (intentional) "
                    "or reorder=False (disable).",
                    ReorderEngaged, stacklevel=2,
                )
            (node_features, adjacency_lists, node_to_graph,
             node_labels) = apply_node_permutation(
                perm, node_features, adjacency_lists, node_to_graph,
                node_labels)
            # Original node id living at each (shard, local row); -1 pads.
            node_restore = np.full((num_shards, nodes_per_shard), -1,
                                   np.int32)
            for s in range(num_shards):
                lo = s * nodes_per_shard
                real = int(np.clip(num_nodes - lo, 0, nodes_per_shard))
                if real:
                    node_restore[s, :real] = perm[lo:lo + real]

    # Per-shard real node counts (contiguous ranges; real nodes are a prefix
    # of the global layout so each shard's real nodes are a prefix too).
    shard_real_nodes = [
        int(np.clip(num_nodes - s * nodes_per_shard, 0, nodes_per_shard))
        for s in range(num_shards)
    ]

    # Assign edges to the shard owning the target.
    num_types = len(adjacency_lists)
    shard_edges: List[List[np.ndarray]] = [
        [None] * num_types for _ in range(num_shards)
    ]
    for edge_type, adj in enumerate(adjacency_lists):
        adj = np.asarray(adj, dtype=np.int64).reshape(-1, 2)
        owner = adj[:, 1] // nodes_per_shard
        for s in range(num_shards):
            shard_edges[s][edge_type] = adj[owner == s]

    edge_budgets = tuple(
        _round_up(
            max(shard_edges[s][t].shape[0] for s in range(num_shards)),
            edge_alignment,
        )
        for t in range(num_types)
    )

    feat_dim = node_features.shape[1]
    features = np.zeros((num_shards, nodes_per_shard, feat_dim), dtype=np.float32)
    n2g = np.full((num_shards, nodes_per_shard), num_graphs_padded - 1,
                  dtype=np.int32)
    sources = [
        np.zeros((num_shards, edge_budgets[t]), dtype=np.int32)
        for t in range(num_types)
    ]
    targets = [
        # Padded slots point at the discard row (index nodes_per_shard).
        np.full((num_shards, edge_budgets[t]), nodes_per_shard, dtype=np.int32)
        for t in range(num_types)
    ]
    num_edges = np.zeros((num_shards, num_types), dtype=np.int32)

    for s in range(num_shards):
        lo = s * nodes_per_shard
        real = shard_real_nodes[s]
        if real:
            features[s, :real] = node_features[lo:lo + real]
            n2g[s, :real] = node_to_graph[lo:lo + real]
        for t in range(num_types):
            e = shard_edges[s][t]
            count = e.shape[0]
            if count:
                sources[t][s, :count] = e[:, 0]
                targets[t][s, :count] = e[:, 1] - lo
            num_edges[s, t] = count

    halo_send_idx = None
    halo_ring_send = None
    halo_ring_dists = None
    ext_nodes = None
    if halo:
        # Per (consumer, owner): the sorted unique global rows the consumer's
        # edges reference on that owner. The owner's send list to each
        # destination is the same set expressed in its local row ids.
        needed: List[List[np.ndarray]] = []
        for s in range(num_shards):
            lo, hi = s * nodes_per_shard, (s + 1) * nodes_per_shard
            all_src = np.concatenate(
                [sources[t][s, :num_edges[s, t]] for t in range(num_types)]
            ) if num_edges[s].sum() else np.zeros((0,), np.int64)
            remote = all_src[(all_src < lo) | (all_src >= hi)]
            uniq = np.unique(remote)
            needed.append([
                uniq[(uniq // nodes_per_shard) == r] for r in range(num_shards)
            ])
        max_send = max(
            [needed[s][r].shape[0] for s in range(num_shards)
             for r in range(num_shards)] + [1]
        )
        max_send = _round_up(max_send, 8)
        pad_row = nodes_per_shard - 1
        # Two wire forms. The dense all_to_all pads EVERY (owner, consumer)
        # pair to max_send (bytes ~ S * max_send even when only neighbour
        # shards talk); the ring form runs one ppermute per ACTIVE distance
        # k (owner r -> consumer (r+k) % S), padded per DISTANCE — for
        # locality-sorted graphs only a couple of distances are non-empty.
        # Pick whichever moves at most half the rows (ties -> dense: one
        # collective beats several).
        dist_sizes = []
        for k in range(1, num_shards):
            sizes = [needed[(r + k) % num_shards][r].shape[0]
                     for r in range(num_shards)]
            dist_sizes.append(_round_up(max(sizes), 8) if max(sizes) else 0)
        ring_rows = sum(dist_sizes)
        if halo in ("ring", "dense"):   # forced form (tests/benchmarks)
            use_ring = halo == "ring"
        else:
            use_ring = 2 * ring_rows <= num_shards * max_send
        if use_ring:
            active = [(k, m) for k, m in
                      zip(range(1, num_shards), dist_sizes) if m]
            halo_ring_dists = tuple(k for k, _ in active)
            ring_send = []
            dist_base = {}
            off = 0
            for k, m in active:
                idx = np.full((num_shards, m), pad_row, np.int32)
                for r in range(num_shards):
                    rows = needed[(r + k) % num_shards][r] - r * nodes_per_shard
                    idx[r, :rows.shape[0]] = rows
                ring_send.append(idx)
                dist_base[k] = off
                off += m
            halo_ring_send = tuple(ring_send)
            ext_nodes = nodes_per_shard + (
                _round_up(off, node_alignment) if off else 0)
        else:
            halo_rows = num_shards * max_send
            ext_nodes = nodes_per_shard + _round_up(halo_rows, node_alignment)
            # send list of OWNER r to DESTINATION d = needed[d][r], r-local.
            halo_send_idx = np.full((num_shards, num_shards, max_send),
                                    pad_row, dtype=np.int32)
            for r in range(num_shards):
                for d in range(num_shards):
                    rows = needed[d][r] - r * nodes_per_shard
                    halo_send_idx[r, d, :rows.shape[0]] = rows
        # Remap sources to ext-local ids: halo slot of global row g (owner r)
        # as seen by consumer s = Vp + slab base + position in needed[s][r],
        # where the slab is the owner's (dense) or the ring distance's.
        for s in range(num_shards):
            lo = s * nodes_per_shard
            for t in range(num_types):
                cnt = int(num_edges[s, t])
                col = sources[t][s]
                g_ = col[:cnt].astype(np.int64)
                owner = g_ // nodes_per_shard
                ext = g_ - lo  # local rows resolve directly
                for r in range(num_shards):
                    if r == s:
                        continue
                    mask = owner == r
                    if mask.any():
                        pos = np.searchsorted(needed[s][r], g_[mask])
                        base = (dist_base[(s - r) % num_shards] if use_ring
                                else r * max_send)
                        ext[mask] = nodes_per_shard + base + pos
                col[:cnt] = ext
                col[cnt:] = pad_row  # padded slots gather the local pad row

    scatter_plans = None
    if build_scatter_plans:
        from ..ops.spmm_pallas import build_merged_plans

        src_space = ext_nodes if halo else nodes_per_shard * num_shards
        per_shard_plans = []
        for s_ in range(num_shards):
            plan = build_merged_plans(
                [sources[t][s_] for t in range(num_types)],
                [targets[t][s_] for t in range(num_types)],
                [int(num_edges[s_, t]) for t in range(num_types)],
                nodes_per_shard,
                src_space=src_space,
            )
            per_shard_plans.append(plan.astuple())
        # Stack each plan array across shards (leading mesh axis).
        scatter_plans = tuple(
            np.stack([p[i] for p in per_shard_plans], axis=0)
            for i in range(len(per_shard_plans[0]))
        )

    pair_plans = None
    pair_plans_typed = None
    if build_pair_plans and pair_per_type:
        # Per-TYPE row-split plans per shard (round 5): the streamed
        # single-launch kernel's resident slice is one type's ext rows at
        # FULL feature width (the single-sweep fast form that won the
        # single-chip headline). Same stacking contract as the merged
        # plans: shared groups + per-type max budgets across shards.
        if pair_merge_targets:
            raise ValueError(
                "pair_per_type produces per-type aggregates natively; "
                "combine it with pair_merge_targets=False.")
        from ..ops.pair_spmm import build_pair_plans as _build_pair_plans
        from ..ops.pair_spmm import choose_pair_groups, measure_pair_chunks

        busiest = int(np.argmax(num_edges.sum(axis=1)))
        gf, gb = choose_pair_groups(
            [sources[0][busiest]], [targets[0][busiest]],
            [int(num_edges[busiest, 0])], nodes_per_shard,
            src_space=ext_nodes,
        )
        budgets = []
        for t in range(num_types):
            cf = cb = 0
            for s_ in range(num_shards):
                mf, mb = measure_pair_chunks(
                    [sources[t][s_]], [targets[t][s_]],
                    [int(num_edges[s_, t])], nodes_per_shard,
                    src_space=ext_nodes, group_fwd=gf, group_bwd=gb,
                )
                cf = max(cf, _round_up(mf, gf))
                cb = max(cb, _round_up(mb, gb))
            budgets.append((cf, cb))
        typed_stacked = []
        for t in range(num_types):
            per_shard = [
                _build_pair_plans(
                    [sources[t][s_]], [targets[t][s_]],
                    [int(num_edges[s_, t])], nodes_per_shard,
                    src_space=ext_nodes,
                    chunk_budget_fwd=budgets[t][0],
                    chunk_budget_bwd=budgets[t][1],
                    overflow_budget=0, overflow_size=0,
                    group_fwd=gf, group_bwd=gb,
                ).astuple()
                for s_ in range(num_shards)
            ]
            typed_stacked.append(tuple(
                np.stack([p[i] for p in per_shard], axis=0)
                for i in range(len(per_shard[0]))
            ))
        pair_plans_typed = tuple(typed_stacked)
    elif build_pair_plans:
        # Per-shard block-pair plans over the EXT-LOCAL source row space
        # ``l * ext_nodes + u`` ([local | halo slabs]) — the gather-free fast
        # path (ops/pair_spmm.py) composed with the boundary halo exchange:
        # every MP layer runs the same kernels as single-chip, the halo
        # collective still overlaps the local node-space transforms (the
        # plans consume the self-assembled ext tables), and targets stay
        # local. All shards share one (max) chunk/overflow budget so the
        # plan arrays stack on the mesh axis.
        from ..ops.pair_spmm import build_pair_plans as _build_pair_plans
        from ..ops.pair_spmm import choose_pair_groups, measure_pair_chunks

        def shard_edges_args(s_):
            return (
                [sources[t][s_] for t in range(num_types)],
                [targets[t][s_] for t in range(num_types)],
                [int(num_edges[s_, t]) for t in range(num_types)],
            )

        # Grid-group sizes chosen from the BUSIEST shard's run statistics
        # (the plans must share groups to stack on the mesh axis, and the
        # most expensive shard gates the SPMD step time — a skewed
        # partition must not let a sparse shard 0 pick groups that inflate
        # the dense shard's plans).
        busiest = int(np.argmax(num_edges.sum(axis=1)))
        gf, gb = choose_pair_groups(
            *shard_edges_args(busiest), nodes_per_shard, src_space=ext_nodes,
            merge_targets=pair_merge_targets,
        )
        cf = cb = 0
        for s_ in range(num_shards):
            mf, mb = measure_pair_chunks(
                *shard_edges_args(s_), nodes_per_shard, src_space=ext_nodes,
                merge_targets=pair_merge_targets,
                group_fwd=gf, group_bwd=gb,
            )
            cf = max(cf, _round_up(mf, gf))
            cb = max(cb, _round_up(mb, gb))
        per_shard_pair = []
        for s_ in range(num_shards):
            # Budgets are per-shard maxima, so no edge ever spills;
            # overflow_size=0 keeps the stacked plan shapes uniform AND
            # skips the XLA overflow term on device entirely.
            plans = _build_pair_plans(
                *shard_edges_args(s_), nodes_per_shard, src_space=ext_nodes,
                chunk_budget_fwd=cf, chunk_budget_bwd=cb,
                overflow_budget=0, overflow_size=0,
                merge_targets=pair_merge_targets,
                group_fwd=gf, group_bwd=gb,
            )
            per_shard_pair.append(plans.astuple())
        pair_plans = tuple(
            np.stack([p[i] for p in per_shard_pair], axis=0)
            for i in range(len(per_shard_pair[0]))
        )

    from ..data.graph_batch import host_in_degrees

    in_degrees = np.stack([
        host_in_degrees([targets[t][s] for t in range(num_types)],
                        nodes_per_shard)
        for s in range(num_shards)
    ], axis=0)  # [S, L, Vp] (discard-row targets dropped, as on device)

    batch = GraphBatch(
        node_features=features,
        edge_sources=tuple(sources),
        edge_targets=tuple(targets),
        node_to_graph=n2g,
        num_nodes=np.asarray(shard_real_nodes, dtype=np.int32),
        num_edges=num_edges,
        num_graphs=np.full((num_shards,), num_graphs, dtype=np.int32),
        num_graphs_padded=num_graphs_padded,
        spmd_axis=axis_name,
        spmd_num_shards=num_shards,
        scatter_plans=scatter_plans,
        pair_plans=pair_plans,
        pair_plans_typed=pair_plans_typed,
        pair_targets_merged=bool(pair_plans is not None and pair_merge_targets),
        in_degrees=in_degrees,
        halo_send_idx=halo_send_idx,
        halo_ext_nodes=ext_nodes,
        halo_ring_send=halo_ring_send,
        halo_ring_dists=halo_ring_dists,
        node_restore=node_restore,
    )

    labels: Dict[str, np.ndarray] = {}
    for key, values in (node_labels or {}).items():
        padded = np.zeros((num_shards, nodes_per_shard) + values.shape[1:],
                          dtype=values.dtype)
        for s in range(num_shards):
            lo, real = s * nodes_per_shard, shard_real_nodes[s]
            if real:
                padded[s, :real] = values[lo:lo + real]
        labels[key] = padded
    for key, values in (graph_labels or {}).items():
        padded = np.zeros((num_graphs_padded,) + values.shape[1:], dtype=values.dtype)
        padded[:values.shape[0]] = values
        labels[key] = np.broadcast_to(
            padded, (num_shards,) + padded.shape
        ).copy()
    return batch, labels


def _boundary_row_count(adjacency_lists, nodes_per_shard: int,
                        relabel: Optional[np.ndarray]) -> int:
    """Unique (consumer shard, source node) pairs whose edge crosses a
    contiguous-range partition — exactly the rows a halo exchange must move
    per MP layer. ``relabel`` (inverse permutation) evaluates a candidate
    ordering without building anything."""
    parts = [np.asarray(a, np.int64).reshape(-1, 2)
             for a in adjacency_lists if np.asarray(a).size]
    if not parts:
        return 0
    edges = np.concatenate(parts, axis=0)
    if relabel is not None:
        edges = relabel[edges]
    own_src = edges[:, 0] // nodes_per_shard
    own_tgt = edges[:, 1] // nodes_per_shard
    cross = own_src != own_tgt
    if not cross.any():
        return 0
    span = int(edges[:, 0].max()) + 1
    return np.unique(own_tgt[cross] * span + edges[cross, 0]).size


def restore_node_order(outputs, batch: GraphBatch) -> np.ndarray:
    """Per-node outputs of a partitioned run, in the caller's ORIGINAL node
    order (host-side; [num_real_nodes, ...]).

    ``outputs`` is the stacked per-shard array ([S, rows, ...]) a
    shard_mapped forward returns, or its flattened form. When the batch was
    built with ``reorder`` applied, ``batch.node_restore`` maps each (shard,
    row) back to the original id; otherwise real rows are per-shard prefixes
    of the identity layout.
    """
    out = np.asarray(outputs)
    num_shards = batch.spmd_num_shards or 1
    if out.ndim >= 2 and out.shape[0] == num_shards:
        out = out.reshape((out.shape[0] * out.shape[1],) + out.shape[2:])
    if batch.node_restore is None:
        reals = np.atleast_1d(np.asarray(batch.num_nodes))
        rows = out.shape[0] // num_shards
        return np.concatenate([
            out[s * rows:s * rows + int(reals[s])]
            for s in range(num_shards)
        ])
    ids = np.asarray(batch.node_restore).reshape(-1)
    valid = ids >= 0
    restored = np.empty((int(ids.max()) + 1,) + out.shape[1:], out.dtype)
    restored[ids[valid]] = out[:ids.shape[0]][valid]
    return restored


def make_spmd_train_step(model, optimizer, mesh: Mesh, axis_name: str = "nodes"):
    """Jitted node-partitioned train step over ``mesh``.

    (TrainState, partitioned GraphBatch, labels) -> (TrainState, metrics).
    The per-shard backward pass produces partial gradients of the *global*
    loss; a psum completes them. Parameters stay replicated.
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
        # The per-shard loss is the REPLICATED global loss (psum-ed inside the
        # metrics), and transpose(psum) == psum, so each shard's backward pass
        # already carries a uniform factor of axis_size on the loss cotangent.
        # pmean therefore completes the partial parameter gradients to exactly
        # the gradient of the (single) global loss.
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)
        return grads, metrics

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
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                       rng=next_rng),
            metrics,
        )

    return train_step


def make_spmd_eval_step(model, mesh: Mesh, axis_name: str = "nodes"):
    def per_shard(params, batch, labels):
        batch = _squeeze_leading(batch)
        labels = _squeeze_leading(labels)
        task_output = model.apply({"params": params}, batch, False)
        return model.compute_task_metrics(batch, task_output, labels)

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_spmd_forward(model, mesh: Mesh, axis_name: str = "nodes"):
    """Jitted forward: (params, partitioned batch) -> stacked task output."""

    def per_shard(params, batch):
        batch = _squeeze_leading(batch)
        out = model.apply({"params": params}, batch, False)
        return jax.tree.map(lambda x: x[None], out)

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)
