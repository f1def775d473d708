"""Pallas TPU kernel for the SpMM hot loop: sorted-segment scatter-add.

XLA's scatter lowering dominates the message-passing step (~70-80% of the
train step on the PPI-shaped benchmark: gather+scatter ~3.6 ms/layer vs
~0.3 ms for all node-space matmuls). This module replaces the scatter with a
one-hot MXU matmul over target-sorted, chunk-aligned edges:

* the host (plan_sorted_scatter) sorts each edge type by target and splits
  the edge stream into chunks of ``CHUNK_EDGES`` edges such that every
  chunk's targets fall inside ONE node block of ``BLOCK_NODES`` rows; chunks
  are padded with sentinel slots (rel_target == BLOCK_NODES -> one-hot zero),
* the kernel runs a (feature-tiles, chunks) grid — chunks innermost so the
  non-decreasing block_ids sequence revisits an output block only in
  consecutive steps, accumulating in VMEM; per step it builds the
  [BLOCK_NODES, CHUNK_EDGES] one-hot matrix from the chunk's block-relative
  targets with a broadcasted-iota compare (VPU) and adds
  ``one_hot @ messages_chunk`` (MXU) into the block,
* the output aliases a zeros buffer so node blocks with no incoming edges
  stay exactly zero.

FLOP cost: |slots| * BLOCK_NODES * H MACs — with BLOCK_NODES=128 this is far
cheaper than the HBM round-trips it replaces, and the messages stream is read
exactly once at full bandwidth.

Reference semantics replaced: tf.math.unsorted_segment_sum at
tf2_gnn/layers/message_passing/message_passing.py:166-179 (sum aggregation).
"""
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_NODES = 128   # node rows per output block (one-hot height)
CHUNK_EDGES = 512   # edges per chunk (one-hot width)


def plan_chunk_budget(edge_budget: int, num_nodes_padded: int) -> int:
    """Static number of chunks for ``edge_budget`` edges of one type.

    Worst case every node-block boundary forces one partially-filled chunk
    (V/BLOCK_NODES extras) on top of the dense packing.
    """
    dense = math.ceil(max(edge_budget, 1) / CHUNK_EDGES)
    boundaries = math.ceil(num_nodes_padded / BLOCK_NODES)
    # Round to a multiple of 8: rel_tgt rows are fed in (8, CHUNK_EDGES)
    # sublane blocks.
    return math.ceil((dense + boundaries) / 8) * 8


def plan_sorted_scatter(
    targets: np.ndarray,
    num_edges_real: int,
    num_nodes_padded: int,
    num_chunks: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side scatter plan for one edge type.

    ``targets``: int target ids per edge, real edges first; entries at
    index >= num_edges_real are ignored. Returns

    * ``perm``      int32 [num_chunks * CHUNK_EDGES]: original edge index per
      chunk slot, -1 for sentinel padding,
    * ``rel_tgt``   int32 [num_chunks * CHUNK_EDGES]: target relative to the
      chunk's node block (sentinels get BLOCK_NODES),
    * ``block_ids`` int32 [num_chunks]: non-decreasing node-block index per
      chunk (trailing unused chunks repeat the last block).
    """
    real = np.asarray(targets[:num_edges_real], dtype=np.int64)
    order = np.argsort(real, kind="stable")
    sorted_tgt = real[order]

    slots = num_chunks * CHUNK_EDGES
    perm = np.full((slots,), -1, dtype=np.int32)
    rel_tgt = np.full((slots,), BLOCK_NODES, dtype=np.int32)
    block_ids = np.zeros((num_chunks,), dtype=np.int32)

    # Native single-pass planner when available (~100x the Python loop).
    from ..native import scatter_plan as native_scatter_plan

    used = native_scatter_plan(
        sorted_tgt.astype(np.int32), order.astype(np.int32),
        num_chunks, CHUNK_EDGES, BLOCK_NODES, perm, rel_tgt, block_ids,
    )
    if used is not None:
        if used < 0:
            raise ValueError(
                f"Scatter plan overflow: needs more than {num_chunks} chunks."
            )
        return perm, rel_tgt, block_ids

    chunk, pos, current_block = 0, 0, -1
    for i in range(sorted_tgt.shape[0]):
        block = int(sorted_tgt[i]) // BLOCK_NODES
        if current_block == -1:
            current_block = block
            block_ids[chunk] = block
        elif block != current_block or pos == CHUNK_EDGES:
            chunk += 1
            pos = 0
            current_block = block
            if chunk >= num_chunks:
                raise ValueError(
                    f"Scatter plan overflow: needs more than {num_chunks} chunks."
                )
            block_ids[chunk] = block
        slot = chunk * CHUNK_EDGES + pos
        perm[slot] = order[i]
        rel_tgt[slot] = int(sorted_tgt[i]) - current_block * BLOCK_NODES
        pos += 1
    # Keep block_ids non-decreasing through the unused tail.
    if current_block >= 0 and chunk + 1 < num_chunks:
        block_ids[chunk + 1:] = block_ids[chunk]
    return perm, rel_tgt, block_ids


def apply_plan_to_sources(sources: np.ndarray, perm: np.ndarray,
                          pad_source: int) -> np.ndarray:
    """Chunk-ordered source ids: sources[perm], sentinels -> pad_source."""
    out = np.full(perm.shape, pad_source, dtype=np.int32)
    valid = perm >= 0
    out[valid] = np.asarray(sources)[perm[valid]]
    return out


class EdgeScatterPlan:
    """Host-built dual plan for one edge type's fused gather/scatter.

    Forward: edges chunked by TARGET (src_by_tgt / rel_tgt / tgt_blocks);
    backward: the same edges chunked by SOURCE (tgt_by_src / rel_src /
    src_blocks) so the gradient scatter also rides the MXU kernel.
    """

    __slots__ = ("src_by_tgt", "rel_tgt", "tgt_blocks",
                 "tgt_by_src", "rel_src", "src_blocks")

    def __init__(self, src_by_tgt, rel_tgt, tgt_blocks,
                 tgt_by_src, rel_src, src_blocks):
        self.src_by_tgt = src_by_tgt
        self.rel_tgt = rel_tgt
        self.tgt_blocks = tgt_blocks
        self.tgt_by_src = tgt_by_src
        self.rel_src = rel_src
        self.src_blocks = src_blocks

    def astuple(self):
        return (self.src_by_tgt, self.rel_tgt, self.tgt_blocks,
                self.tgt_by_src, self.rel_src, self.src_blocks)


def build_dual_plans(
    sources: np.ndarray,
    targets: np.ndarray,
    num_edges_real: int,
    num_nodes_padded: int,
    num_chunks: int,
) -> EdgeScatterPlan:
    """Build forward (by-target) + backward (by-source) scatter plans."""
    pad = num_nodes_padded - 1
    perm_t, rel_tgt, tgt_blocks = plan_sorted_scatter(
        targets, num_edges_real, num_nodes_padded, num_chunks
    )
    src_by_tgt = apply_plan_to_sources(sources, perm_t, pad_source=pad)
    perm_s, rel_src, src_blocks = plan_sorted_scatter(
        sources, num_edges_real, num_nodes_padded, num_chunks
    )
    tgt_by_src = apply_plan_to_sources(targets, perm_s, pad_source=pad)
    return EdgeScatterPlan(src_by_tgt, rel_tgt, tgt_blocks,
                           tgt_by_src, rel_src, src_blocks)


class MergedScatterPlan:
    """Host-built plan covering ALL edge types of a batch in one kernel.

    The per-type tables are stacked [L, V, H] and flattened to [L*V, H];
    source ids become ``l*V + src`` so one gather serves every type, and the
    forward scatter runs over the shared target space [V]. The backward
    scatter runs over the merged [L*V] row space (the gradient of table row
    (l, u) sums exactly the type-l edges with source u). ``type_fwd`` /
    ``type_bwd`` + absolute target ids let per-edge normalisation scales
    (1/deg_l(tgt)) be gathered on device in either slot order.
    """

    __slots__ = ("src_merged", "rel_tgt", "tgt_blocks", "type_fwd", "tgtabs_fwd",
                 "tgtabs_by_src", "rel_src", "src_blocks", "type_bwd",
                 "bwd_to_fwd_slot", "inv_fwd", "inv_bwd")

    def __init__(self, src_merged, rel_tgt, tgt_blocks, type_fwd, tgtabs_fwd,
                 tgtabs_by_src, rel_src, src_blocks, type_bwd, bwd_to_fwd_slot,
                 inv_fwd, inv_bwd):
        self.src_merged = src_merged
        self.rel_tgt = rel_tgt
        self.tgt_blocks = tgt_blocks
        self.type_fwd = type_fwd
        self.tgtabs_fwd = tgtabs_fwd
        self.tgtabs_by_src = tgtabs_by_src
        self.rel_src = rel_src
        self.src_blocks = src_blocks
        self.type_bwd = type_bwd
        # For each backward (source-sorted) slot: the forward slot holding the
        # same edge (slots sentinel -> points at a fwd sentinel slot). Lets
        # gather cotangents be re-ordered into backward slot order so the
        # gradient scatter also runs the sorted Pallas kernel.
        self.bwd_to_fwd_slot = bwd_to_fwd_slot
        # Host-precomputed per-slot 1/(per-type in-degree of the edge's
        # target + eps) in forward / backward slot order. A device-side
        # per-slot gather of these costs ~3.5 ms/step on the PPI bench
        # (scalar-gather rate limited); the host bincount is free.
        self.inv_fwd = inv_fwd
        self.inv_bwd = inv_bwd

    def astuple(self):
        return (self.src_merged, self.rel_tgt, self.tgt_blocks, self.type_fwd,
                self.tgtabs_fwd, self.tgtabs_by_src, self.rel_src,
                self.src_blocks, self.type_bwd, self.bwd_to_fwd_slot,
                self.inv_fwd, self.inv_bwd)


def build_merged_plans(
    sources_per_type,
    targets_per_type,
    counts_per_type,
    num_nodes_padded: int,
    src_space: int = None,
) -> MergedScatterPlan:
    """Merged dual plan over all edge types (see MergedScatterPlan).

    ``src_space``: row count of ONE type's source table (defaults to the
    local padded node count). Under SPMD node partitioning sources are
    GLOBAL ids while targets are local, so the source row space is the
    all-gathered global table's per-type row count.
    """
    v = num_nodes_padded
    if src_space is None:
        src_space = v
    num_types = len(sources_per_type)
    srcs, tgts, types = [], [], []
    for l in range(num_types):
        c = int(counts_per_type[l])
        srcs.append(
            np.asarray(sources_per_type[l][:c], dtype=np.int64) + l * src_space
        )
        tgts.append(np.asarray(targets_per_type[l][:c], dtype=np.int64))
        types.append(np.full((c,), l, dtype=np.int64))
    all_src = np.concatenate(srcs) if srcs else np.zeros((0,), np.int64)
    all_tgt = np.concatenate(tgts) if tgts else np.zeros((0,), np.int64)
    all_type = np.concatenate(types) if types else np.zeros((0,), np.int64)
    n = all_src.shape[0]
    total_budget = sum(
        int(np.asarray(sources_per_type[l]).shape[0]) for l in range(num_types)
    )

    c_fwd = plan_chunk_budget(total_budget, v)
    perm_f, rel_tgt, tgt_blocks = plan_sorted_scatter(all_tgt, n, v, c_fwd)
    src_merged = apply_plan_to_sources(all_src, perm_f, pad_source=0)
    type_fwd = apply_plan_to_sources(all_type, perm_f, pad_source=0)
    tgtabs_fwd = apply_plan_to_sources(all_tgt, perm_f, pad_source=0)

    c_bwd = plan_chunk_budget(total_budget, num_types * src_space)
    perm_b, rel_src, src_blocks = plan_sorted_scatter(
        all_src, n, num_types * src_space, c_bwd
    )
    tgtabs_by_src = apply_plan_to_sources(all_tgt, perm_b, pad_source=0)
    type_bwd = apply_plan_to_sources(all_type, perm_b, pad_source=0)

    # Forward slot index of each edge, then re-ordered into backward slots.
    fwd_slot_of_edge = np.zeros((max(n, 1),), dtype=np.int64)
    valid_f = perm_f >= 0
    fwd_slot_of_edge[perm_f[valid_f]] = np.nonzero(valid_f)[0]
    sentinel_fwd = int(np.nonzero(~valid_f)[0][0]) if (~valid_f).any() else 0
    bwd_to_fwd_slot = np.full(perm_b.shape, sentinel_fwd, dtype=np.int32)
    valid_b = perm_b >= 0
    bwd_to_fwd_slot[valid_b] = fwd_slot_of_edge[perm_b[valid_b]]

    # Host-precomputed 1/deg normalisation scales (see MergedScatterPlan).
    from ..utils.constants import SMALL_NUMBER

    deg = np.zeros((num_types * v,), np.float32)
    if n:
        np.add.at(deg, (all_type * v + all_tgt).astype(np.int64), 1.0)
    inv = (1.0 / (deg + SMALL_NUMBER)).astype(np.float32)
    inv_fwd = (inv[np.minimum(type_fwd.astype(np.int64) * v + tgtabs_fwd,
                              inv.shape[0] - 1)] * valid_f).astype(np.float32)
    inv_bwd = (inv[np.minimum(type_bwd.astype(np.int64) * v + tgtabs_by_src,
                              inv.shape[0] - 1)] * valid_b).astype(np.float32)
    return MergedScatterPlan(src_merged, rel_tgt, tgt_blocks, type_fwd,
                             tgtabs_fwd, tgtabs_by_src, rel_src, src_blocks,
                             type_bwd, bwd_to_fwd_slot, inv_fwd, inv_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def typed_gather_scatter(
    tables_flat: jnp.ndarray,   # [L*V, H] stacked per-type node tables
    scale_fwd: jnp.ndarray,     # f32 [slots] per-slot edge weight (fwd order)
    scale_bwd: jnp.ndarray,     # f32 [slots2] same weights in bwd slot order
    src_merged: jnp.ndarray,
    rel_tgt: jnp.ndarray,
    tgt_blocks: jnp.ndarray,
    type_fwd: jnp.ndarray,      # unused on device; part of the plan pytree
    tgtabs_fwd: jnp.ndarray,    # unused on device
    tgtabs_by_src: jnp.ndarray,
    rel_src: jnp.ndarray,
    src_blocks: jnp.ndarray,
    num_nodes: int,
    interpret=None,
) -> jnp.ndarray:
    """One fused pass for ALL edge types:
    ``out[v] = sum over edges e=(u -> v, type l) of scale_e * tables[l*V+u]``.
    """
    msgs = jnp.take(tables_flat, src_merged, axis=0, mode="clip")
    return sorted_segment_sum_scaled(msgs, scale_fwd, rel_tgt, tgt_blocks,
                                     num_nodes, interpret=interpret)


def _tgs_fwd(tables_flat, scale_fwd, scale_bwd, src_merged, rel_tgt,
             tgt_blocks, type_fwd, tgtabs_fwd, tgtabs_by_src, rel_src,
             src_blocks, num_nodes, interpret):
    out = typed_gather_scatter(tables_flat, scale_fwd, scale_bwd, src_merged,
                               rel_tgt, tgt_blocks, type_fwd, tgtabs_fwd,
                               tgtabs_by_src, rel_src, src_blocks, num_nodes,
                               interpret)
    return out, (tables_flat.shape[0], scale_bwd, tgtabs_by_src, rel_src,
                 src_blocks)


def _tgs_bwd(num_nodes, interpret, res, g):
    rows, scale_bwd, tgtabs_by_src, rel_src, src_blocks = res
    g_msgs = jnp.take(g, tgtabs_by_src, axis=0, mode="clip")
    d_tables = sorted_segment_sum_scaled(
        g_msgs, scale_bwd, rel_src, src_blocks, rows, interpret=interpret
    )
    return (d_tables,) + (None,) * 10


typed_gather_scatter.defvjp(_tgs_fwd, _tgs_bwd)


def _feature_tile(h: int) -> int:
    for tile in (512, 384, 256, 128):
        if h % tile == 0:
            return tile
    return h  # single tile; mosaic pads the lane dim


def _scaled_scatter_kernel(block_ids_ref, rel_tgt_ref, scale_ref, msgs_ref,
                           zeros_ref, out_ref):
    """Scatter with a per-edge scalar weight folded into the one-hot columns
    (used to fold 1/deg normalisation into the aggregation)."""
    del zeros_ref
    c = pl.program_id(1)
    rel = rel_tgt_ref[c % 8, :]
    scale = scale_ref[c % 8, :]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK_NODES, CHUNK_EDGES), 0
    )
    one_hot = (rows == rel[None, :]).astype(jnp.float32) * scale[None, :]
    partial_sum = jnp.dot(
        one_hot.astype(msgs_ref.dtype), msgs_ref[:],
        preferred_element_type=jnp.float32,
    )

    prev = block_ids_ref[jnp.maximum(c - 1, 0)]
    is_first_visit = jnp.logical_or(c == 0, block_ids_ref[c] != prev)

    @pl.when(is_first_visit)
    def _():
        out_ref[:, :] = partial_sum

    @pl.when(jnp.logical_not(is_first_visit))
    def _():
        out_ref[:, :] = out_ref[:, :] + partial_sum


def sorted_segment_sum(
    msgs: jnp.ndarray,       # [num_chunks * CHUNK_EDGES, H] chunk-ordered
    rel_tgt: jnp.ndarray,    # int32 [num_chunks * CHUNK_EDGES]
    block_ids: jnp.ndarray,  # int32 [num_chunks], non-decreasing
    num_nodes: int,          # padded row count (multiple of block_rows)
    interpret=None,
    block_rows: int = None,
) -> jnp.ndarray:
    """Scatter-add chunk-ordered messages into [num_nodes, H] on the MXU.

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU (tests on
    the virtual CPU mesh run the same code path). ``block_rows`` overrides the
    output block height (default BLOCK_NODES); rel values must lie in
    [0, block_rows) with >= block_rows as sentinel — used by the type-minor
    target-gather transpose where a node block expands to BLOCK_NODES*L rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_rows is None:
        block_rows = BLOCK_NODES
    slots, h = msgs.shape
    num_chunks = slots // CHUNK_EDGES
    if num_nodes % block_rows != 0:
        raise ValueError(f"num_nodes {num_nodes} not a multiple of {block_rows}.")
    tile = _feature_tile(h)
    h_tiles = h // tile

    def kernel(block_ids_ref, rel_tgt_ref, msgs_ref, zeros_ref, out_ref):
        del zeros_ref
        c = pl.program_id(1)
        rel = rel_tgt_ref[c % 8, :]
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, CHUNK_EDGES), 0
        )
        one_hot = (rows == rel[None, :]).astype(msgs_ref.dtype)
        partial_sum = jnp.dot(one_hot, msgs_ref[:],
                              preferred_element_type=jnp.float32)
        prev = block_ids_ref[jnp.maximum(c - 1, 0)]
        is_first_visit = jnp.logical_or(c == 0, block_ids_ref[c] != prev)

        @pl.when(is_first_visit)
        def _():
            out_ref[:, :] = partial_sum

        @pl.when(jnp.logical_not(is_first_visit))
        def _():
            out_ref[:, :] = out_ref[:, :] + partial_sum

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_ids
        grid=(h_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((8, CHUNK_EDGES), lambda t, c, ids: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, tile), lambda t, c, ids: (c, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, tile), lambda t, c, ids: (ids[c], t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, tile),
                               lambda t, c, ids: (ids[c], t),
                               memory_space=pltpu.VMEM),
    )
    zeros = jnp.zeros((num_nodes, h), dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), jnp.float32),
        input_output_aliases={3: 0},  # zeros buffer -> out (indices include
                                      # the scalar-prefetch operand)
        cost_estimate=pl.CostEstimate(
            flops=2 * slots * block_rows * h,
            bytes_accessed=slots * h * 4 + num_nodes * h * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_ids, rel_tgt.reshape(num_chunks, CHUNK_EDGES), msgs, zeros)


def sorted_segment_sum_scaled(
    msgs: jnp.ndarray,       # [num_chunks * CHUNK_EDGES, H] chunk-ordered
    scale: jnp.ndarray,      # f32 [num_chunks * CHUNK_EDGES] per-edge weight
    rel_tgt: jnp.ndarray,
    block_ids: jnp.ndarray,
    num_nodes: int,
    interpret=None,
) -> jnp.ndarray:
    """Weighted scatter-add: out[v] = sum over slots targeting v of
    scale[e] * msgs[e]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    slots, h = msgs.shape
    num_chunks = slots // CHUNK_EDGES
    if num_nodes % BLOCK_NODES != 0:
        raise ValueError(f"num_nodes {num_nodes} not a multiple of {BLOCK_NODES}.")
    tile = _feature_tile(h)
    h_tiles = h // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((8, CHUNK_EDGES), lambda t, c, ids: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CHUNK_EDGES), lambda t, c, ids: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, tile), lambda t, c, ids: (c, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_NODES, tile), lambda t, c, ids: (ids[c], t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_NODES, tile),
                               lambda t, c, ids: (ids[c], t),
                               memory_space=pltpu.VMEM),
    )
    zeros = jnp.zeros((num_nodes, h), dtype=jnp.float32)
    return pl.pallas_call(
        _scaled_scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), jnp.float32),
        input_output_aliases={4: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * slots * BLOCK_NODES * h,
            bytes_accessed=slots * h * 4 + num_nodes * h * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        block_ids,
        rel_tgt.reshape(num_chunks, CHUNK_EDGES),
        scale.astype(jnp.float32).reshape(num_chunks, CHUNK_EDGES),
        msgs,
        zeros,
    )


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gather_scatter_sorted(
    table: jnp.ndarray,        # [V, H] node-space (transformed) features
    src_by_tgt: jnp.ndarray,   # int32 [slots] sources in target-chunk order
    rel_tgt: jnp.ndarray,      # fwd plan
    tgt_blocks: jnp.ndarray,
    tgt_by_src: jnp.ndarray,   # int32 [slots2] ABS targets in source-chunk order
    rel_src: jnp.ndarray,      # bwd plan (edges sorted/chunked by source)
    src_blocks: jnp.ndarray,
    num_nodes: int,
    interpret=None,
) -> jnp.ndarray:
    """Fused edge pass: out[v] = sum over edges (u -> v) of table[u].

    Forward: XLA row gather (bandwidth-bound, reads the table once per edge)
    feeding the Pallas sorted scatter. Backward: the exact transpose —
    d_table[u] = sum over edges (u -> v) of g[v] — runs the SAME kernel with
    the roles of source/target swapped, using a second host-built plan with
    edges chunked by source. Sentinel slots in either plan contribute zero
    (rel == BLOCK_NODES -> empty one-hot column; tgt_by_src sentinels carry
    an out-of-range id whose gather is zeroed by the rel mask).
    """
    msgs = jnp.take(table, src_by_tgt, axis=0, mode="clip")
    return sorted_segment_sum(msgs, rel_tgt, tgt_blocks, num_nodes,
                              interpret=interpret)


def _gss_fwd(table, src_by_tgt, rel_tgt, tgt_blocks, tgt_by_src, rel_src,
             src_blocks, num_nodes, interpret):
    out = gather_scatter_sorted(table, src_by_tgt, rel_tgt, tgt_blocks,
                                tgt_by_src, rel_src, src_blocks, num_nodes,
                                interpret)
    return out, (table.shape[0], src_by_tgt, rel_tgt, tgt_blocks, tgt_by_src,
                 rel_src, src_blocks)


def _gss_bwd(num_nodes, interpret, res, g):
    v_rows, src_by_tgt, rel_tgt, tgt_blocks, tgt_by_src, rel_src, src_blocks = res
    g_msgs = jnp.take(g, tgt_by_src, axis=0, mode="clip")
    g_msgs = jnp.where((rel_src >= BLOCK_NODES)[:, None], 0.0, g_msgs)
    d_table = sorted_segment_sum(g_msgs, rel_src, src_blocks, v_rows,
                                 interpret=interpret)
    return d_table, None, None, None, None, None, None


gather_scatter_sorted.defvjp(_gss_fwd, _gss_bwd)


# ---------------------------------------------------------------------------
# Generic plan-based primitives: every message-passing flavour composes from
# these three (gather-by-source, gather-by-target, scatter-to-target), each
# with a sorted Pallas kernel on BOTH sides of autodiff. Elementwise per-edge
# math (FiLM modulation, attention weighting, MLP layers over edge rows)
# happens between them in plain XLA, which fuses it into the gather outputs.

@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def plan_gather_src(tables_flat, src_merged, rel_src, src_blocks,
                    bwd_to_fwd_slot, rows: int, interpret=None):
    """msgs[slot] = tables_flat[src_merged[slot]] with a sorted-kernel
    gradient (cotangents re-ordered into source-sorted slots)."""
    return jnp.take(tables_flat, src_merged, axis=0, mode="clip")


def _pgs_fwd(tables_flat, src_merged, rel_src, src_blocks, bwd_to_fwd_slot,
             rows, interpret):
    out = plan_gather_src(tables_flat, src_merged, rel_src, src_blocks,
                          bwd_to_fwd_slot, rows, interpret)
    return out, (rel_src, src_blocks, bwd_to_fwd_slot)


def _pgs_bwd(rows, interpret, res, g):
    rel_src, src_blocks, bwd_to_fwd_slot = res
    g_b = jnp.take(g, bwd_to_fwd_slot, axis=0, mode="clip")
    g_b = jnp.where((rel_src >= BLOCK_NODES)[:, None], 0.0, g_b)
    d_tables = sorted_segment_sum(g_b, rel_src, src_blocks, rows,
                                  interpret=interpret)
    return d_tables, None, None, None, None


plan_gather_src.defvjp(_pgs_fwd, _pgs_bwd)



@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def plan_scatter(weighted, rel_tgt, tgt_blocks, tgtabs_fwd, num_nodes: int,
                 interpret=None):
    """out[v] = sum over slots targeting v of weighted[slot] (Pallas sorted
    kernel); gradient is a plain gather by absolute target."""
    return sorted_segment_sum(weighted, rel_tgt, tgt_blocks, num_nodes,
                              interpret=interpret)


def _ps_fwd(weighted, rel_tgt, tgt_blocks, tgtabs_fwd, num_nodes, interpret):
    out = plan_scatter(weighted, rel_tgt, tgt_blocks, tgtabs_fwd, num_nodes,
                       interpret)
    return out, (rel_tgt, tgtabs_fwd)


def _ps_bwd(num_nodes, interpret, res, g):
    rel_tgt, tgtabs_fwd = res
    d_weighted = jnp.take(g, tgtabs_fwd, axis=0, mode="clip")
    d_weighted = jnp.where((rel_tgt >= BLOCK_NODES)[:, None], 0.0, d_weighted)
    return d_weighted, None, None, None


plan_scatter.defvjp(_ps_fwd, _ps_bwd)


PLAN_FIELDS = ("src_merged", "rel_tgt", "tgt_blocks", "type_fwd", "tgtabs_fwd",
               "tgtabs_by_src", "rel_src", "src_blocks", "type_bwd",
               "bwd_to_fwd_slot", "inv_fwd", "inv_bwd")


class PlanView:
    """Attribute view over a GraphBatch.scatter_plans tuple."""

    def __init__(self, plan_tuple):
        for name, value in zip(PLAN_FIELDS, plan_tuple):
            setattr(self, name, value)


def _segment_max_kernel(block_ids_ref, rel_tgt_ref, vals_ref, neg_ref, out_ref):
    """Per-node-block max over chunk edges (VPU select + reduce).

    Same chunk/block structure as the scatter kernel, with max as the
    combiner: out[v, k] = max over slots targeting v of vals[slot, k].
    Unvisited rows keep the aliased -inf fill (wrapper converts to 0).
    """
    del neg_ref
    c = pl.program_id(1)
    rel = rel_tgt_ref[c % 8, :]  # [CHUNK_EDGES]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK_NODES, CHUNK_EDGES), 0
    )
    one_hot = rows == rel[None, :]  # bool [BN, CE]
    vals = vals_ref[:]  # [CE, K]
    # Per-head 2D select+reduce (Mosaic rejects the 3D narrow-minor-dim
    # broadcast); K is small and static.
    k = vals.shape[1]
    cols = []
    for h in range(k):
        sel = jnp.where(one_hot, vals[:, h][None, :], -jnp.inf)  # [BN, CE]
        cols.append(jnp.max(sel, axis=1))  # [BN]
    partial_max = jnp.stack(cols, axis=1)  # [BN, K]

    prev = block_ids_ref[jnp.maximum(c - 1, 0)]
    is_first_visit = jnp.logical_or(c == 0, block_ids_ref[c] != prev)

    @pl.when(is_first_visit)
    def _():
        out_ref[:, :] = partial_max

    @pl.when(jnp.logical_not(is_first_visit))
    def _():
        out_ref[:, :] = jnp.maximum(out_ref[:, :], partial_max)


def sorted_segment_max(
    vals: jnp.ndarray,       # [slots, K] chunk-ordered values
    rel_tgt: jnp.ndarray,
    block_ids: jnp.ndarray,
    num_nodes: int,
    interpret=None,
) -> jnp.ndarray:
    """Per-target max of chunk-ordered values; empty targets give 0.

    Forward-only (callers stop-gradient the result — it backs softmax
    stabilisation, whose true gradient contribution is zero).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    slots, k = vals.shape
    num_chunks = slots // CHUNK_EDGES
    if num_nodes % BLOCK_NODES != 0:
        raise ValueError(f"num_nodes {num_nodes} not a multiple of {BLOCK_NODES}.")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, num_chunks),
        in_specs=[
            pl.BlockSpec((8, CHUNK_EDGES), lambda t, c, ids: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, k), lambda t, c, ids: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_NODES, k), lambda t, c, ids: (ids[c], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_NODES, k), lambda t, c, ids: (ids[c], 0),
                               memory_space=pltpu.VMEM),
    )
    fill = jnp.full((num_nodes, k), -jnp.inf, dtype=jnp.float32)
    out = pl.pallas_call(
        _segment_max_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, k), jnp.float32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(block_ids, rel_tgt.reshape(num_chunks, CHUNK_EDGES),
      vals.astype(jnp.float32), fill)
    return jnp.where(jnp.isfinite(out), out, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def plan_gather_tgt_typed(table_tl: jnp.ndarray, type_fwd: jnp.ndarray,
                          tgtabs_fwd: jnp.ndarray, rel_tgt: jnp.ndarray,
                          tgt_blocks: jnp.ndarray, num_types: int,
                          interpret=None):
    """Per-edge-type TARGET gather over a TYPE-MINOR table [V*L, F]
    (row = tgt*L + l).

    With type-minor layout the merged target ids of a forward chunk stay
    inside ONE expanded node block of BLOCK_NODES*L rows, so the gradient
    scatter reuses the FORWARD plan directly (rel' = rel*L + type, same
    block_ids) — no third plan ordering and no cotangent permutation. This is
    what makes FiLM / target-state-input fused paths competitive.
    """
    return jnp.take(table_tl, tgtabs_fwd * num_types + type_fwd, axis=0,
                    mode="clip")


def _pgtt_fwd(table_tl, type_fwd, tgtabs_fwd, rel_tgt, tgt_blocks, num_types,
              interpret):
    out = plan_gather_tgt_typed(table_tl, type_fwd, tgtabs_fwd, rel_tgt,
                                tgt_blocks, num_types, interpret)
    return out, (table_tl.shape[0], type_fwd, rel_tgt, tgt_blocks)


def _pgtt_bwd(num_types, interpret, res, g):
    rows, type_fwd, rel_tgt, tgt_blocks = res
    block = BLOCK_NODES * num_types
    sentinel = rel_tgt >= BLOCK_NODES
    rel_typed = jnp.where(sentinel, block, rel_tgt * num_types + type_fwd)
    g = jnp.where(sentinel[:, None], 0.0, g)
    d_table = sorted_segment_sum(g, rel_typed, tgt_blocks, rows,
                                 interpret=interpret, block_rows=block)
    return d_table, None, None, None, None


plan_gather_tgt_typed.defvjp(_pgtt_fwd, _pgtt_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def attention_scatter(expd, msgs, rel_tgt, tgt_blocks, tgtabs_fwd,
                      sentinel_mask, num_nodes: int, num_heads: int,
                      interpret=None):
    """Fused attention aggregation: one kernel pass produces BOTH the softmax
    denominators and the weight-summed messages.

    ``expd``: f32 [slots, K] exp(shifted logits), sentinel slots zeroed;
    ``msgs``: [slots, H] messages in HK-MAJOR head layout — column hk*K + k
    (pltpu.repeat tiles, so tiling expd K columns head_dim times aligns with
    this layout). Returns (denom [num_nodes, K], weighted [num_nodes, H])
    where weighted[v, hk*K+k] = sum over slots targeting v of
    expd[slot, k] * msgs[slot, hk*K+k]. Per-edge attention weights are never
    materialised.
    """
    del sentinel_mask
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    slots, h = msgs.shape
    k = expd.shape[1]
    head_dim = h // k
    num_chunks = slots // CHUNK_EDGES
    if num_nodes % BLOCK_NODES != 0:
        raise ValueError(f"num_nodes {num_nodes} not a multiple of {BLOCK_NODES}.")

    def kernel(block_ids_ref, rel_ref, expd_ref, msgs_ref, zeros_d_ref,
               zeros_w_ref, denom_ref, weighted_ref):
        del zeros_d_ref, zeros_w_ref
        c = pl.program_id(0)
        rel = rel_ref[c % 8, :]
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_NODES, CHUNK_EDGES), 0
        )
        one_hot = (rows == rel[None, :]).astype(msgs_ref.dtype)
        e = expd_ref[:]  # [CE, K]
        scaled = msgs_ref[:] * pltpu.repeat(
            e.astype(msgs_ref.dtype), head_dim, axis=1
        )  # [CE, H]
        denom_partial = jnp.dot(one_hot, e.astype(msgs_ref.dtype),
                                preferred_element_type=jnp.float32)
        weighted_partial = jnp.dot(one_hot, scaled,
                                   preferred_element_type=jnp.float32)

        prev = block_ids_ref[jnp.maximum(c - 1, 0)]
        first = jnp.logical_or(c == 0, block_ids_ref[c] != prev)

        @pl.when(first)
        def _():
            denom_ref[:, :] = denom_partial
            weighted_ref[:, :] = weighted_partial

        @pl.when(jnp.logical_not(first))
        def _():
            denom_ref[:, :] = denom_ref[:, :] + denom_partial
            weighted_ref[:, :] = weighted_ref[:, :] + weighted_partial

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((8, CHUNK_EDGES), lambda c, ids: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, k), lambda c, ids: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, h), lambda c, ids: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_NODES, k), lambda c, ids: (ids[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_NODES, h), lambda c, ids: (ids[c], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_NODES, k), lambda c, ids: (ids[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_NODES, h), lambda c, ids: (ids[c], 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    zeros_d = jnp.zeros((num_nodes, k), dtype=jnp.float32)
    zeros_w = jnp.zeros((num_nodes, h), dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_nodes, k), jnp.float32),
            jax.ShapeDtypeStruct((num_nodes, h), jnp.float32),
        ),
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(tgt_blocks, rel_tgt.reshape(num_chunks, CHUNK_EDGES),
      expd, msgs, zeros_d, zeros_w)


def _as_fwd(expd, msgs, rel_tgt, tgt_blocks, tgtabs_fwd, sentinel_mask,
            num_nodes, num_heads, interpret):
    out = attention_scatter(expd, msgs, rel_tgt, tgt_blocks, tgtabs_fwd,
                            sentinel_mask, num_nodes, num_heads, interpret)
    return out, (expd, msgs, tgtabs_fwd, sentinel_mask)


def _as_bwd(num_nodes, num_heads, interpret, res, g):
    expd, msgs, tgtabs_fwd, sentinel_mask = res
    d_denom, d_weighted = g
    slots, h = msgs.shape
    head_dim = h // num_heads
    d_w_g = jnp.take(d_weighted, tgtabs_fwd, axis=0, mode="clip")
    d_d_g = jnp.take(d_denom, tgtabs_fwd, axis=0, mode="clip")
    mask = sentinel_mask[:, None]
    d_w_g = jnp.where(mask, 0.0, d_w_g)
    d_d_g = jnp.where(mask, 0.0, d_d_g)
    # hk-major: d_msgs[e, hk*K+k] = expd[e,k] * d_weighted[tgt_e, hk*K+k]
    d_msgs = d_w_g * jnp.tile(expd, (1, head_dim))
    # d_expd[e,k] = sum_hk msgs[e,hk*K+k] * d_weighted[tgt_e,hk*K+k] + d_denom
    prod = (msgs.astype(jnp.float32) * d_w_g).reshape(slots, head_dim, num_heads)
    d_expd = prod.sum(axis=1) + d_d_g
    return d_expd, d_msgs.astype(msgs.dtype), None, None, None, None


attention_scatter.defvjp(_as_fwd, _as_bwd)
