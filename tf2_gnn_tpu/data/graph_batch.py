"""Statically-shaped padded graph batches — the framework-wide data contract.

The reference batches graphs ragged (every step has a different V/E —
tf2_gnn/data/graph_dataset.py:161-246 — tolerated via relaxed tf.function
signatures). XLA compiles one program per shape, so the TPU-native contract is
instead a *padded* batch with fixed budgets:

* nodes padded to ``num_nodes_padded`` rows (zeros),
* each edge type padded to its ``edge_budgets[l]`` with edges pointing
  pad-node -> pad-node, so padded messages gather zeros-ish garbage and
  scatter ONLY into pad rows (real nodes never observe padding),
* graphs padded to ``num_graphs_padded`` segments; pad nodes map to the last
  graph slot, which is always a pad slot (the batcher packs at most
  ``num_graphs_padded - 1`` real graphs).

Segment ops therefore need no masks in the hot loop; only losses/metrics mask
by validity, via the ``node_mask``/``graph_mask``/``edge_mask`` helpers.
"""
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PaddingConfig:
    """Static shape budgets for one batch stream (fixed per dataset+fold)."""

    num_nodes: int = struct.field(pytree_node=False)
    num_graphs: int = struct.field(pytree_node=False)
    edge_budgets: Tuple[int, ...] = struct.field(pytree_node=False)
    # Static chunk budgets for the block-pair SpMM plans (ops/pair_spmm.py);
    # None when the dataset does not build pair plans.
    pair_chunks_fwd: Optional[int] = struct.field(pytree_node=False, default=None)
    pair_chunks_bwd: Optional[int] = struct.field(pytree_node=False, default=None)
    pair_overflow: Optional[int] = struct.field(pytree_node=False, default=None)
    # Per-TYPE (fwd, bwd) chunk budgets when the dataset builds one pair
    # plan per edge type (``pair_per_type`` — large graphs whose merged
    # [L*V] row space exceeds the kernels' VMEM residency budget).
    pair_chunks_typed: Optional[Tuple[Tuple[int, int], ...]] = struct.field(
        pytree_node=False, default=None)
    # Grid-group sizes the pair plans were built with (chunks per grid step;
    # chosen per dataset by ops/pair_spmm.py::choose_pair_groups — run
    # alignment pads every output-block run to a multiple of the group, so
    # tiny-run workloads want small groups).
    pair_group_fwd: Optional[int] = struct.field(pytree_node=False,
                                                 default=None)
    pair_group_bwd: Optional[int] = struct.field(pytree_node=False,
                                                 default=None)

    @property
    def num_edge_types(self) -> int:
        return len(self.edge_budgets)


@struct.dataclass
class GraphBatch:
    """One padded mega-graph (a batch of disconnected graphs).

    Shapes (V = padded node count, L = edge types, E_l = per-type edge budget,
    G = padded graph count, D = node feature dim):

    * ``node_features``: f32 [V, D]
    * ``edge_sources`` / ``edge_targets``: tuple of L int32 [E_l]
    * ``node_to_graph``: int32 [V] (pad nodes -> G - 1)
    * ``num_nodes`` / ``num_graphs``: int32 scalars (real counts)
    * ``num_edges``: int32 [L] (real counts per type)
    """

    node_features: jnp.ndarray
    edge_sources: Tuple[jnp.ndarray, ...]
    edge_targets: Tuple[jnp.ndarray, ...]
    node_to_graph: jnp.ndarray
    num_nodes: jnp.ndarray
    num_edges: jnp.ndarray
    num_graphs: jnp.ndarray
    num_graphs_padded: int = struct.field(pytree_node=False)
    # SPMD node-partitioned mode (parallel/spmd.py): when set, this batch is
    # one shard of a node-partitioned giant graph executing under shard_map
    # over the named mesh axis. ``edge_sources`` then hold GLOBAL node ids
    # (gathered via all_gather over the axis), ``edge_targets`` hold LOCAL ids
    # with padded slots pointing at the local discard row (index
    # num_nodes_padded), and graph-level segment reductions psum over the axis.
    spmd_axis: Optional[str] = struct.field(pytree_node=False, default=None)
    # Number of shards on the spmd axis (static; set by the partitioner).
    # Needed to reshape all_gather-ed node tables to their global row count.
    spmd_num_shards: Optional[int] = struct.field(pytree_node=False, default=None)
    # Optional merged dual scatter plan covering ALL edge types for the
    # Pallas sorted-segment SpMM kernel (ops/spmm_pallas.py
    # MergedScatterPlan.astuple() — 10 int32 arrays). Built by the batcher
    # when the dataset enables ``use_pallas_spmm``.
    scatter_plans: Optional[Tuple[jnp.ndarray, ...]] = None
    # Optional block-pair plan (ops/pair_spmm.py PairPlans.astuple() — 13
    # arrays: 10 int32 plan arrays + 3 f32 per-slot scale arrays) for the
    # gather-free pair SpMM kernel. Built when the dataset enables
    # ``use_pair_spmm``; preferred over ``scatter_plans`` by the source-table
    # fused paths when the table fits VMEM.
    pair_plans: Optional[Tuple[jnp.ndarray, ...]] = None
    # Per-TYPE pair plans (tuple of PairPlans.astuple() — one per edge type,
    # each over the [V] single-type row space): the row-split form for
    # graphs whose merged [L*V] tables exceed the kernels' VMEM residency
    # budget (e.g. the QM9 config's 5 x 16k rows). The fused paths launch
    # the kernel once per type and stack/sum the results.
    pair_plans_typed: Optional[Tuple[Tuple[jnp.ndarray, ...], ...]] = None
    # Optional host-precomputed per-type in-degrees f32 [L, V]: exactly what
    # calculate_type_to_num_incoming_edges computes on device (including
    # padded-edge counts landing on the pad row), bincounted for free at
    # batch build instead of ~1.4 ms/step of scalar scatter-adds.
    in_degrees: Optional[jnp.ndarray] = None
    # Static: pair_plans were built with merge_targets=True, i.e. the pair
    # kernel emits per-type aggregates [L*V, H] instead of the joint [V, H]
    # sum (used by flavours whose target-side math factorises into node
    # space: GNN-FiLM, target-state edge MLPs).
    pair_targets_merged: bool = struct.field(pytree_node=False, default=False)
    # Boundary-halo SPMD mode (parallel/spmd.py::partition_graph(halo=True)):
    # ``halo_send_idx`` [S, max_send] holds, per DESTINATION shard, the local
    # row indices this shard sends each MP layer (padded with the local pad
    # row); ``edge_sources`` are then EXT-LOCAL ids into
    # ``[local rows | shard-0 halo | shard-1 halo | ...]`` of
    # ``halo_ext_nodes`` rows, and no per-layer all_gather happens at all —
    # each layer exchanges only boundary rows via one all_to_all
    # (MessagePassing._exchange_halo).
    halo_send_idx: Optional[jnp.ndarray] = None
    halo_ext_nodes: Optional[int] = struct.field(pytree_node=False,
                                                 default=None)
    # Ring-halo variant (chosen by the partitioner when per-DISTANCE padding
    # beats the dense all_to_all's per-pair padding — ring-local graphs):
    # ``halo_ring_send[i]`` [S, m_i] lists the local rows each shard sends at
    # ring distance ``halo_ring_dists[i]`` (one ppermute per active
    # distance); the ext layout is [local | dist-d0 slab | dist-d1 slab ...].
    halo_ring_send: Optional[Tuple[jnp.ndarray, ...]] = None
    halo_ring_dists: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None)
    # Set when the partitioner applied a locality reordering
    # (parallel/reorder.py RCM): int32 [S, rows] = ORIGINAL node id living at
    # each (shard, local row), -1 on padding. Per-node outputs return to the
    # caller's order via parallel.restore_node_order(out, batch).
    node_restore: Optional[jnp.ndarray] = None

    @property
    def halo_mode(self) -> bool:
        """True when sources are EXT-LOCAL ids resolved by a per-layer
        boundary exchange (dense all_to_all or ppermute ring)."""
        return (self.halo_send_idx is not None
                or self.halo_ring_send is not None)

    # ---- static shape accessors -------------------------------------------------
    @property
    def num_nodes_padded(self) -> int:
        return self.node_features.shape[0]

    @property
    def pair_src_space(self) -> int:
        """Row count of ONE edge type's source table for the pair kernels:
        the ext row space ``[local | halo slabs]`` under SPMD-halo (pair
        plans are built with ext-local source ids), the padded node count
        otherwise."""
        if self.halo_mode and self.halo_ext_nodes is not None:
            return self.halo_ext_nodes
        return self.num_nodes_padded

    @property
    def num_edge_types(self) -> int:
        return len(self.edge_sources)

    @property
    def pad_node_index(self) -> int:
        return self.num_nodes_padded - 1

    # ---- SPMD helpers ------------------------------------------------------------
    @property
    def aggregation_segments(self) -> int:
        """Segment count for scatter-reduces over edge targets: the local node
        rows plus (in SPMD mode) one trailing discard row for padded edges."""
        return self.num_nodes_padded + (1 if self.spmd_axis is not None else 0)

    def slice_aggregated(self, aggregated: jnp.ndarray) -> jnp.ndarray:
        """Drop the SPMD discard row from a [aggregation_segments, ...] array."""
        if self.spmd_axis is None:
            return aggregated
        return aggregated[: self.num_nodes_padded]

    def gather_source_rows(self, table: jnp.ndarray, edge_type: int) -> jnp.ndarray:
        """Gather per-edge source rows from a node-space table.

        ``table`` is [V_local, ...] (or [L, V_local, ...] — pass table[l]).
        In halo mode the table already covers the ext row space (the layer
        computed it from the halo-exchanged states) and source ids are
        ext-local, so the gather is plain; in legacy SPMD mode the table is
        first all_gather-ed over the mesh axis so GLOBAL source ids resolve.
        """
        from ..ops.segment import gather_rows

        indices = self.edge_sources[edge_type]
        if self.spmd_axis is not None and not self.halo_mode:
            table = jax.lax.all_gather(table, self.spmd_axis, axis=0, tiled=True)
        return gather_rows(table, indices)

    def gather_target_rows(self, table: jnp.ndarray, edge_type: int) -> jnp.ndarray:
        """Gather per-edge target rows — always local (each shard owns the
        edges that target its nodes; padded slots clamp into the last row and
        only ever influence the discard row)."""
        from ..ops.segment import gather_rows

        return gather_rows(table, self.edge_targets[edge_type])

    # ---- validity masks ----------------------------------------------------------
    @property
    def node_mask(self) -> jnp.ndarray:
        """f32 [V]: 1.0 for real nodes, 0.0 for padding."""
        return (jnp.arange(self.num_nodes_padded) < self.num_nodes).astype(jnp.float32)

    @property
    def graph_mask(self) -> jnp.ndarray:
        """f32 [G]: 1.0 for real graphs, 0.0 for padding."""
        return (jnp.arange(self.num_graphs_padded) < self.num_graphs).astype(jnp.float32)

    def edge_mask(self, edge_type: int) -> jnp.ndarray:
        """f32 [E_l]: 1.0 for real edges of the given type."""
        budget = self.edge_sources[edge_type].shape[0]
        return (jnp.arange(budget) < self.num_edges[edge_type]).astype(jnp.float32)


def pad_batch_arrays(
    node_features: np.ndarray,
    adjacency_lists: Sequence[np.ndarray],
    node_to_graph: np.ndarray,
    num_graphs: int,
    config: PaddingConfig,
) -> GraphBatch:
    """Pad ragged numpy batch arrays up to ``config``'s budgets.

    The inputs follow the reference's batch contract (concatenated graphs,
    [E,2] adjacency per type — data/graph_dataset.py:224-246); the output is a
    static-shape ``GraphBatch``.
    """
    num_real_nodes = node_features.shape[0]
    v_pad = config.num_nodes
    if num_real_nodes > v_pad - 1:
        raise ValueError(
            f"Batch has {num_real_nodes} nodes but padded budget {v_pad} requires "
            f"at most {v_pad - 1} (one pad node is reserved as scatter sink)."
        )
    if num_graphs > config.num_graphs - 1:
        raise ValueError(
            f"Batch has {num_graphs} graphs but padded budget {config.num_graphs} "
            f"requires at most {config.num_graphs - 1}."
        )
    if len(adjacency_lists) != config.num_edge_types:
        raise ValueError(
            f"Batch has {len(adjacency_lists)} edge types, config expects "
            f"{config.num_edge_types}."
        )

    feat = np.zeros((v_pad, node_features.shape[1]), dtype=np.float32)
    feat[:num_real_nodes] = node_features

    n2g = np.full((v_pad,), config.num_graphs - 1, dtype=np.int32)
    n2g[:num_real_nodes] = node_to_graph

    pad_node = v_pad - 1
    sources: List[np.ndarray] = []
    targets: List[np.ndarray] = []
    real_edge_counts: List[int] = []
    for edge_type, adj in enumerate(adjacency_lists):
        budget = config.edge_budgets[edge_type]
        count = adj.shape[0]
        if count > budget:
            raise ValueError(
                f"Edge type {edge_type} has {count} edges, over budget {budget}."
            )
        src = np.full((budget,), pad_node, dtype=np.int32)
        tgt = np.full((budget,), pad_node, dtype=np.int32)
        if count:
            src[:count] = adj[:, 0]
            tgt[:count] = adj[:, 1]
        sources.append(src)
        targets.append(tgt)
        real_edge_counts.append(count)

    return GraphBatch(
        node_features=feat,
        edge_sources=tuple(sources),
        edge_targets=tuple(targets),
        node_to_graph=n2g,
        num_nodes=np.int32(num_real_nodes),
        num_edges=np.asarray(real_edge_counts, dtype=np.int32),
        num_graphs=np.int32(num_graphs),
        num_graphs_padded=config.num_graphs,
        in_degrees=host_in_degrees(targets, v_pad),
    )


def host_in_degrees(padded_targets: Sequence[np.ndarray],
                    num_nodes_padded: int) -> np.ndarray:
    """f32 [L, V] per-type in-degree over the FULL padded target arrays —
    bit-identical to the device segment counts (padded edges land on the pad
    row; SPMD discard-row targets, index V, are dropped)."""
    deg = np.zeros((len(padded_targets), num_nodes_padded), np.float32)
    for l, tgt in enumerate(padded_targets):
        counts = np.bincount(np.asarray(tgt).reshape(-1),
                             minlength=num_nodes_padded + 1)
        deg[l] = counts[:num_nodes_padded]
    return deg


def pad_node_label_array(values: np.ndarray, num_nodes_padded: int) -> np.ndarray:
    """Zero-pad a per-node label array [V_real, ...] up to [V_pad, ...]."""
    out = np.zeros((num_nodes_padded,) + values.shape[1:], dtype=values.dtype)
    out[: values.shape[0]] = values
    return out


def pad_graph_label_array(values: np.ndarray, num_graphs_padded: int) -> np.ndarray:
    """Zero-pad a per-graph label array [G_real, ...] up to [G_pad, ...]."""
    values = np.asarray(values)
    out = np.zeros((num_graphs_padded,) + values.shape[1:], dtype=values.dtype)
    out[: values.shape[0]] = values
    return out
