"""Block-pair fused gather+scatter SpMM — the Pallas fast path for
``out[v] = sum over edges e=(u -> v) of scale_e * table[src_e]``.

The sorted-scatter kernel (spmm_pallas.py) feeds on an XLA row gather that is
row-rate limited on TPU (measured 36 GB/s bf16 / 95 GB/s f32 payload,
benchmarks/kernel_micro.py) and dominates the train step. This module removes
the gather entirely:

* the host sorts real edges by (target-block, source-block) and pads each
  pair's edges into chunks of ``E_C`` slots (batched disconnected graphs are
  near block-diagonal, so pair inflation is small — 1.4-1.7x on the
  PPI-shaped bench),
* the kernel keeps the whole node table FEATURE TILE resident in VMEM (one
  DMA per tile pass) and per chunk computes, entirely on the MXU,

      A    = (onehot_tgt * scale) @ onehot_src        # [BLK, BLK]
      out += A @ table[src_block]                     # [BLK, TILE]

  i.e. both the gather and the scatter become matmuls against one-hot
  factors built from broadcasted-iota compares. ``GROUP`` chunks sharing one
  target block execute per grid step to amortise per-step overhead
  (unroll16: 0.71 ms vs 3.96 ms for gather+scatter on the PPI bench —
  benchmarks/pair_probe.py).
* edges that don't fit the static chunk budget (low-density structure)
  spill into a small XLA gather/segment-sum overflow term, so any graph is
  handled; the planner reports the spill so callers can disable the path
  for datasets where it dominates.

The backward pass is the same kernel with source/target roles swapped
(d_table = A^T @ g), driven by a second plan sorted by source block.

Replaces the hot loop at reference message_passing.py:166-179 +
embedding_lookup:197-202 for sum aggregation.
"""
import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.shapes import round_up as _round_up
from .spmm_pallas import BLOCK_NODES as BLK

E_C = 128    # edge slots per chunk (one (tgt_block, src_block) pair each)
GROUP = 16   # chunks per grid step (all sharing one target block)
# The BACKWARD plan uses a smaller group: its output blocks are merged
# source rows, whose runs are much shorter than the forward plan's target
# runs (PPI bench: 171 runs of mean 14 chunks vs 57 runs of mean 42), so
# GROUP-16 run alignment pads the plan ~2x while GROUP-8 costs only extra
# grid steps. Kernels derive each plan's group from its array shapes
# (src_blk.size // grp_tgt.size), so the two directions can differ freely.
BWD_GROUP = 8
TILE = 128   # feature tile; the wrapper pads H to a multiple of TILE
# The table feature tile must stay resident in VMEM; above this budget the
# caller should fall back to the sorted-scatter path (row-splitting is the
# future extension for huge tables).
VMEM_TABLE_BUDGET_BYTES = 11 * 1024 * 1024


# Dot precision: the kernels keep the MXU's DEFAULT single pass for every
# table dtype — the same policy XLA applies to the model's own f32 dense
# matmuls under jit (f32 inputs truncate to bf16 per pass). Forcing HIGHEST
# for f32 tables was tried 2026-08-19 and measured 2x on the QM9 shipped
# config (f32 streams, 8 layers): bit-exactness vs the f32 jnp twins is a
# test-tolerance question (~1% bf16-truncation level), not worth 3x MXU
# passes in a framework whose surrounding matmuls round identically.


class PairPlan(NamedTuple):
    """Host-built plan for one direction of the pair kernel.

    ``rel_*`` use sentinel ``BLK`` on padded slots (one-hot misses);
    ``src_blk``/``grp_tgt`` address table/output blocks per chunk/group.
    Absolute slot ids are reconstructed on device:
    ``srcabs = src_blk[slot // E_C] * BLK + rel_src`` (invalid where
    ``rel_src >= BLK``), likewise for targets via ``grp_tgt``.
    """

    rel_src: np.ndarray    # int32 [C, E_C]
    rel_tgt: np.ndarray    # int32 [C, E_C]
    src_blk: np.ndarray    # int32 [C]
    grp_tgt: np.ndarray    # int32 [C // group]; group = C // grp_tgt.size


def plan_group(src_blk, grp_tgt) -> int:
    """Chunks per grid step of a plan, encoded by its array shapes."""
    return src_blk.shape[0] // grp_tgt.shape[0]


def slot_abs_ids(rel_src, rel_tgt, src_blk, grp_tgt):
    """Absolute (src_row, tgt_row, valid) per kernel slot of one plan
    direction — THE single decode of the plan layout (``srcabs =
    src_blk[slot // E_C] * BLK + rel_src``, targets via the group's
    ``grp_tgt``, sentinel ``rel >= BLK`` marks padded slots)."""
    rel_s = jnp.asarray(rel_src).reshape(-1)
    rel_t = jnp.asarray(rel_tgt).reshape(-1)
    chunk = jnp.arange(rel_s.shape[0]) // E_C
    group = plan_group(src_blk, grp_tgt)
    srcabs = jnp.asarray(src_blk)[chunk] * BLK + jnp.minimum(rel_s, BLK - 1)
    tgtabs = (jnp.asarray(grp_tgt)[chunk // group] * BLK
              + jnp.minimum(rel_t, BLK - 1))
    valid = (rel_s < BLK) & (rel_t < BLK)
    return srcabs, tgtabs, valid


class PairPlans(NamedTuple):
    """Forward + backward plans + overflow edges + per-slot 1/deg scales.

    The tuple form holds only arrays (they ride a GraphBatch as traced pytree
    leaves); the host-side overflow count is not needed on device — padded
    overflow slots carry scale 0 and target the discard row.

    ``inv_*`` are the per-slot ``1/(per-type in-degree of the edge's target
    + eps)`` normalisation scales in forward / backward / overflow slot
    order, PRECOMPUTED ON THE HOST: a device-side per-slot gather of these
    scales measures 3.5 ms/step on the PPI bench (scalar-gather rate-limited)
    while the host bincount+index is microseconds at batch-build time.
    Slots that don't hold a real edge carry scale 0.
    """

    fwd: PairPlan          # out rows = num_nodes (scatter by target)
    bwd: PairPlan          # out rows = table rows (gradient scatter by source)
    ovf_src: np.ndarray    # int32 [OVF] merged source row ids (sentinel 0)
    ovf_tgt: np.ndarray    # int32 [OVF] target ids (sentinel num_nodes)
    inv_fwd: np.ndarray    # f32 [C_f * E_C] 1/deg scale per forward slot
    inv_bwd: np.ndarray    # f32 [C_b * E_C] 1/deg scale per backward slot
    inv_ovf: np.ndarray    # f32 [OVF] 1/deg scale per overflow slot

    def astuple(self) -> Tuple[np.ndarray, ...]:
        return (tuple(self.fwd) + tuple(self.bwd)
                + (self.ovf_src, self.ovf_tgt,
                   self.inv_fwd, self.inv_bwd, self.inv_ovf))

    @classmethod
    def fromtuple(cls, arrays) -> "PairPlans":
        return cls(
            PairPlan(*arrays[0:4]), PairPlan(*arrays[4:8]),
            arrays[8], arrays[9], arrays[10], arrays[11], arrays[12],
        )

    @property
    def kernel_arrays(self) -> Tuple[np.ndarray, ...]:
        """The 10 plan arrays ``pair_typed_gather_scatter`` consumes."""
        return tuple(self.fwd) + tuple(self.bwd) + (self.ovf_src, self.ovf_tgt)


def pair_chunk_budget(total_edge_budget: int, out_rows: int,
                      inflation: float = 2.0) -> int:
    """Conservative static chunk budget: assumed slot inflation over real
    edges plus worst-case group-alignment padding per output block run."""
    dense = math.ceil(max(total_edge_budget, 1) * inflation / E_C)
    runs = out_rows // BLK
    return math.ceil((dense + runs) / GROUP) * GROUP + runs * GROUP


def _plan_one_direction(
    src: np.ndarray, tgt: np.ndarray, chunk_budget: Optional[int],
    group: int = GROUP,
) -> Tuple[Optional[PairPlan], np.ndarray]:
    """Pair-chunk one direction. ``chunk_budget=None`` sizes the plan to the
    data (single-batch use). Returns (plan, overflow_edge_mask, edge_slot)
    where the mask marks input edges that did not fit the chunk budget
    (smallest pairs are spilled first) and ``edge_slot[i]`` is input edge
    i's kernel slot (-1 when spilled) — the cheap hook for per-slot scale
    scatters (re-deriving slot ids from the plan costs ~200 ms/batch on a
    1-CPU host). ``group`` chunks share one target block per grid step
    (runs pad to a multiple of it); ``chunk_budget`` must divide by it.
    """
    n = src.shape[0]
    overflow_mask = np.zeros((n,), bool)
    edge_slot = np.full((n,), -1, np.int64)
    if chunk_budget is not None and chunk_budget % group:
        raise ValueError(
            f"pair chunk budget {chunk_budget} not a multiple of {group}")

    if n == 0:
        chunk_budget = chunk_budget or group
        num_groups = chunk_budget // group
        rel = np.full((chunk_budget, E_C), BLK, np.int32)
        plan = PairPlan(rel, rel.copy(),
                        np.zeros((chunk_budget,), np.int32),
                        np.zeros((num_groups,), np.int32))
        return plan, overflow_mask, edge_slot

    if chunk_budget is not None:
        # Native fast path (same stable layout; ~10x the numpy planner on a
        # 1-CPU host). Falls through to numpy on overflow — only numpy
        # implements pair spilling.
        from ..native import pair_plan as native_pair_plan

        native = native_pair_plan(src, tgt, chunk_budget, group, BLK, E_C)
        if native is not None and native[0] >= 0:
            _, rel_s, rel_t, src_blk, tgt_blk, edge_slot = native
            plan = PairPlan(rel_s.reshape(chunk_budget, E_C),
                            rel_t.reshape(chunk_budget, E_C),
                            src_blk, tgt_blk[::group].copy())
            return plan, overflow_mask, edge_slot

    sb = src // BLK
    tb = tgt // BLK
    order = np.lexsort((sb, tb))
    s_src, s_tgt, s_sb, s_tb = src[order], tgt[order], sb[order], tb[order]
    pair = s_tb.astype(np.int64) * (int(sb.max()) + 2) + s_sb
    change = np.flatnonzero(np.diff(pair)) + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [n])))
    keep_pair = np.ones(starts.shape[0], bool)

    def grouping(keep):
        """Per-kept-pair chunk starts with tgt-run group alignment."""
        p_tb = s_tb[starts[keep]]
        p_chunks = (counts[keep] + E_C - 1) // E_C
        # Runs of equal tgt block over kept pairs.
        run_change = np.flatnonzero(np.diff(p_tb)) + 1
        run_starts = np.concatenate(([0], run_change))
        run_ends = np.concatenate((run_change, [p_tb.shape[0]]))
        csum = np.concatenate(([0], np.cumsum(p_chunks)))
        run_sizes = csum[run_ends] - csum[run_starts]
        run_padded = ((run_sizes + group - 1) // group) * group
        run_base = np.concatenate(([0], np.cumsum(run_padded)))[:-1]
        # Chunk start of each kept pair: run base + offset within run.
        pair_run = np.repeat(np.arange(run_starts.shape[0]),
                             run_ends - run_starts)
        pair_off = csum[:-1] - csum[run_starts][pair_run]
        chunk_start = run_base[pair_run] + pair_off
        total = int(run_base[-1] + run_padded[-1]) if run_padded.size else 0
        return chunk_start, p_chunks, total, p_tb, run_base, run_padded

    chunk_start, p_chunks, total, p_tb, _, _ = grouping(keep_pair)
    if chunk_budget is None:
        chunk_budget = max(total, group)
    if total > chunk_budget:
        # Spill smallest pairs (least dense => worst kernel value) until fit,
        # dropping batches of pairs per re-grouping pass.
        by_size = list(np.argsort(counts, kind="stable"))
        while total > chunk_budget and by_size:
            need = total - chunk_budget
            acc = 0
            while by_size and acc < need:
                idx = by_size.pop(0)
                if keep_pair[idx]:
                    keep_pair[idx] = False
                    acc += int((counts[idx] + E_C - 1) // E_C)
            chunk_start, p_chunks, total, p_tb, _, _ = grouping(keep_pair)
        if total > chunk_budget:  # pragma: no cover - all pairs spilled
            keep_pair[:] = False
            total = 0

    rel_src = np.full((chunk_budget * E_C,), BLK, np.int32)
    rel_tgt = np.full((chunk_budget * E_C,), BLK, np.int32)
    src_blk = np.zeros((chunk_budget,), np.int32)
    tgt_blk = np.zeros((chunk_budget,), np.int32)

    kept_idx = np.flatnonzero(keep_pair)
    if kept_idx.size:
        kept_edge = np.repeat(keep_pair, counts)
        e_counts = counts[kept_idx]
        # Slot of each kept edge: pair chunk base * E_C + offset in pair.
        offs = (np.arange(n) - np.repeat(starts, counts))[kept_edge]
        slot = np.repeat(chunk_start, e_counts) * E_C + offs
        rel_src[slot] = (s_src - s_sb * BLK)[kept_edge]
        rel_tgt[slot] = (s_tgt - s_tb * BLK)[kept_edge]
        edge_slot[order[kept_edge]] = slot
        # Chunk metadata: chunks of each pair are consecutive.
        chunk_pair = np.full((chunk_budget,), -1, np.int64)
        tot = int(p_chunks.sum())
        pair_of_chunk = np.repeat(np.arange(kept_idx.shape[0]), p_chunks)
        csum_pc = np.concatenate(([0], np.cumsum(p_chunks)))[:-1]
        ch_idx = (np.repeat(chunk_start, p_chunks)
                  + np.arange(tot) - np.repeat(csum_pc, p_chunks))
        chunk_pair[ch_idx] = pair_of_chunk
        have = chunk_pair >= 0
        src_blk[have] = s_sb[starts[kept_idx]][chunk_pair[have]]
        tgt_blk[have] = s_tb[starts[kept_idx]][chunk_pair[have]]
        # Padding chunks inside/after runs inherit a non-decreasing tgt block
        # and the PREVIOUS real chunk's src block: consumers that compose
        # their output-block index from src_blk (pair_attention's d-score
        # kernel) then see padding chunks as revisits of the preceding block
        # (zero contribution) instead of spurious "first visit" overwrites.
        if not have.all():
            fill = np.maximum.accumulate(np.where(have, tgt_blk, 0))
            tgt_blk[~have] = fill[~have]
            last_real = np.maximum.accumulate(
                np.where(have, np.arange(chunk_budget), 0))
            src_blk[~have] = src_blk[last_real[~have]]
    # Edges of spilled pairs go to overflow (in original input order).
    if not keep_pair.all():
        spilled_edge_sorted = np.repeat(~keep_pair, counts)
        overflow_mask[order[spilled_edge_sorted]] = True

    plan = PairPlan(
        rel_src.reshape(chunk_budget, E_C),
        rel_tgt.reshape(chunk_budget, E_C),
        src_blk,
        tgt_blk[::group].copy(),
    )
    return plan, overflow_mask, edge_slot


def _host_inv_degree_scales(fwd_slots: int, edge_slot_fwd,
                            bwd_slots: int, edge_slot_bwd,
                            ovf_src, ovf_tgt,
                            all_src, all_tgt, v: int, src_space: int,
                            num_types: int, merge_targets: bool = False):
    """Per-slot 1/(per-type in-degree + eps) for fwd/bwd/overflow slots.

    Matches calculate_type_to_num_incoming_edges + the reference's epsilon
    (gnn_edge_mlp.py:102-106): deg_l(t) counts real edges of type l into t.
    With ``merge_targets`` the target ids already carry the type offset, so
    the merged target id indexes the [L*V] degree table directly. Per-slot
    values are direct scatters through the planner's edge->slot maps
    (padded slots keep 0).
    """
    from ..utils.constants import SMALL_NUMBER

    if all_src.size:
        if merge_targets:
            idx = all_tgt
        else:
            idx = (all_src // src_space) * v + all_tgt
        deg = np.bincount(idx, minlength=num_types * v).astype(np.float32)
        inv_edge = (1.0 / (deg + SMALL_NUMBER)).astype(np.float32)[idx]
    else:
        deg = np.zeros((num_types * v,), np.float32)
        inv_edge = np.zeros((0,), np.float32)

    inv_fwd = np.zeros((fwd_slots,), np.float32)
    m = edge_slot_fwd >= 0
    inv_fwd[edge_slot_fwd[m]] = inv_edge[m]
    inv_bwd = np.zeros((bwd_slots,), np.float32)
    m = edge_slot_bwd >= 0
    inv_bwd[edge_slot_bwd[m]] = inv_edge[m]

    out_rows = num_types * v if merge_targets else v
    inv = (1.0 / (deg + SMALL_NUMBER)).astype(np.float32)
    top = inv.shape[0] - 1
    ovf_valid = ovf_tgt < out_rows
    if merge_targets:
        ovf_idx = np.minimum(ovf_tgt, top)
    else:
        ovf_l = ovf_src.astype(np.int64) // src_space
        ovf_idx = np.minimum(ovf_l * v + np.minimum(ovf_tgt, v - 1), top)
    inv_ovf = (inv[ovf_idx] * ovf_valid).astype(np.float32)
    return inv_fwd, inv_bwd, inv_ovf


def build_pair_plans(
    sources_per_type,
    targets_per_type,
    counts_per_type,
    num_nodes_padded: int,
    src_space: int = None,
    chunk_budget_fwd: int = None,
    chunk_budget_bwd: int = None,
    overflow_budget: int = 2048,
    merge_targets: bool = False,
    overflow_size: int = None,
    group_fwd: int = None,
    group_bwd: int = None,
) -> PairPlans:
    """Build forward+backward pair plans over ALL edge types of a batch.

    Sources are merged into the stacked row space ``l * src_space + u``
    (matching the [L*V, H] node tables of the fused message-passing path).

    ``merge_targets=True`` puts TARGETS in the merged space ``l * V + t`` as
    well, so the kernel produces PER-TYPE aggregates ``S_l[v] = sum over
    type-l edges into v`` as an [L*V, H] output. This is the building block
    for flavours whose per-edge target term factorises into node space
    (GNN-FiLM's modulation, the 0-hidden-layer target-state edge MLP):
    aggregate per type, then apply the target-dependent math densely.
    """
    v = num_nodes_padded
    if src_space is None:
        src_space = v
    group_fwd = GROUP if group_fwd is None else group_fwd
    group_bwd = BWD_GROUP if group_bwd is None else group_bwd
    num_types = len(sources_per_type)
    rows = num_types * src_space
    out_rows = num_types * v if merge_targets else v
    srcs, tgts = [], []
    for l in range(num_types):
        c = int(counts_per_type[l])
        srcs.append(np.asarray(sources_per_type[l][:c], np.int64)
                    + l * src_space)
        tgts.append(np.asarray(targets_per_type[l][:c], np.int64)
                    + (l * v if merge_targets else 0))
    all_src = np.concatenate(srcs) if srcs else np.zeros((0,), np.int64)
    all_tgt = np.concatenate(tgts) if tgts else np.zeros((0,), np.int64)

    fwd, ovf_f, slot_f = _plan_one_direction(all_src, all_tgt,
                                             chunk_budget_fwd,
                                             group=group_fwd)
    bwd, ovf_b, slot_b = _plan_one_direction(all_tgt, all_src,
                                             chunk_budget_bwd,
                                             group=group_bwd)
    ovf = ovf_f | ovf_b  # an edge must take the same path in fwd and bwd
    if ovf.any():
        # Re-plan excluding ALL overflow edges so fwd/bwd stay consistent
        # (shapes fixed by the first pass).
        keep = ~ovf
        fwd, extra_f, sf_k = _plan_one_direction(all_src[keep],
                                                 all_tgt[keep],
                                                 fwd.rel_src.shape[0],
                                                 group=group_fwd)
        bwd, extra_b, sb_k = _plan_one_direction(all_tgt[keep],
                                                 all_src[keep],
                                                 bwd.rel_src.shape[0],
                                                 group=group_bwd)
        if extra_f.any() or extra_b.any():  # pragma: no cover
            raise AssertionError("pair plan did not converge")
        slot_f = np.full(all_src.shape, -1, np.int64)
        slot_b = np.full(all_src.shape, -1, np.int64)
        slot_f[keep] = sf_k
        slot_b[keep] = sb_k
    num_overflow = int(ovf.sum())
    if num_overflow > overflow_budget:
        raise ValueError(
            f"{num_overflow} edges spilled the pair-chunk budget "
            f"(fwd {chunk_budget_fwd} / bwd {chunk_budget_bwd}) but the "
            f"overflow budget is {overflow_budget}. Raise "
            f"'pair_chunk_slack'/'pair_overflow_budget' or disable "
            f"'use_pair_spmm' for this dataset."
        )
    # Size the overflow arrays by the REAL spill, not the budget: the
    # budget is only the error threshold above. Datasets whose chunk
    # budgets are measured maxima never spill, and dead padded slots are
    # not free — the XLA fallback term (gather + two segment-sums over
    # `overflow_budget` slots) measured 0.9 ms/layer at the PPI bench
    # shape with 2048 all-padding slots. Zero-size arrays skip the term
    # entirely (callers gate on shape). Callers needing a FIXED static
    # shape across differently-spilling batches pass overflow_size.
    ovf_slots = (_round_up(num_overflow, 8) if num_overflow
                 else 0) if overflow_size is None else overflow_size
    if num_overflow > ovf_slots:
        raise ValueError(
            f"{num_overflow} spilled edges exceed overflow_size {ovf_slots}."
        )
    ovf_src = np.zeros((ovf_slots,), np.int32)
    ovf_tgt = np.full((ovf_slots,), out_rows, np.int32)  # discard row
    if num_overflow:
        ovf_src[:num_overflow] = all_src[ovf]
        ovf_tgt[:num_overflow] = all_tgt[ovf]
    inv_fwd, inv_bwd, inv_ovf = _host_inv_degree_scales(
        fwd.rel_src.size, slot_f, bwd.rel_src.size, slot_b,
        ovf_src, ovf_tgt, all_src, all_tgt, v, src_space, num_types,
        merge_targets,
    )
    return PairPlans(fwd, bwd, ovf_src, ovf_tgt, inv_fwd, inv_bwd, inv_ovf)


def pair_slot_abs_ids(plan_arrays, which: str):
    """Device-side absolute (src, tgt) ids per slot of one direction plus the
    validity mask — used to gather per-edge normalisation scales."""
    plans = PairPlans.fromtuple(plan_arrays)
    p = plans.fwd if which == "fwd" else plans.bwd
    return slot_abs_ids(*p)


def measure_pair_chunks(
    sources_per_type, targets_per_type, counts_per_type,
    num_nodes_padded: int, src_space: int = None,
    merge_targets: bool = False,
    group_fwd: int = GROUP,
    group_bwd: int = BWD_GROUP,
) -> Tuple[int, int]:
    """Chunk counts both directions would need for this batch (used by the
    dataset padding-config derivation to size static budgets)."""
    v = num_nodes_padded
    if src_space is None:
        src_space = v
    srcs, tgts = [], []
    for l, (s, t) in enumerate(zip(sources_per_type, targets_per_type)):
        c = int(counts_per_type[l])
        srcs.append(np.asarray(s[:c], np.int64) + l * src_space)
        tgts.append(np.asarray(t[:c], np.int64)
                    + (l * v if merge_targets else 0))
    all_src = np.concatenate(srcs) if srcs else np.zeros((0,), np.int64)
    all_tgt = np.concatenate(tgts) if tgts else np.zeros((0,), np.int64)
    from ..native import pair_plan_count

    f = pair_plan_count(all_src, all_tgt, group_fwd, BLK, E_C)
    b = pair_plan_count(all_tgt, all_src, group_bwd, BLK, E_C)
    if f is not None and b is not None:
        return max(f, group_fwd), max(b, group_bwd)
    fwd, _, _ = _plan_one_direction(all_src, all_tgt, None, group=group_fwd)
    bwd, _, _ = _plan_one_direction(all_tgt, all_src, None, group=group_bwd)
    return fwd.rel_src.shape[0], bwd.rel_src.shape[0]


def choose_pair_groups(
    sources_per_type, targets_per_type, counts_per_type,
    num_nodes_padded: int, src_space: int = None,
    merge_targets: bool = False,
    candidates: Tuple[int, ...] = (8, 16),
) -> Tuple[int, int]:
    """Pick (group_fwd, group_bwd) for a workload by measured run statistics.

    Output-block runs pad to a multiple of the group, so the right group
    size is workload-dependent: long target runs (PPI-shaped batches, mean
    ~42 chunks/run) amortise per-grid-step overhead best at GROUP 16, while
    tiny runs (QM9's 18-node molecules: 1-2 chunks/run) inflate 10x under
    GROUP-16 alignment with NO grid-step saving (steps = runs either way).
    Cost model: padded_chunks + C * grid_steps with C = 6 chunk-equivalents
    per step (calibrated so the PPI shape keeps its measured optimum 16/8
    and QM9-shaped runs drop to 8/8 — a measured 2048 -> 1024 fwd chunks).
    Candidates are sublane-aligned: the kernels' (group, E_C) rel blocks
    require group % 8 == 0.
    """
    def cost_of(group, swap):
        f, b = measure_pair_chunks(
            sources_per_type, targets_per_type, counts_per_type,
            num_nodes_padded, src_space=src_space,
            merge_targets=merge_targets,
            group_fwd=group if not swap else GROUP,
            group_bwd=group if swap else BWD_GROUP,
        )
        chunks = b if swap else f
        return chunks + 6 * (chunks // group)

    best_f = min(candidates, key=lambda g: cost_of(g, swap=False))
    best_b = min(candidates, key=lambda g: cost_of(g, swap=True))
    return best_f, best_b


def pair_unit_scales(plan_arrays, num_nodes: int):
    """(scale_fwd, scale_bwd, ovf_scale) for unweighted aggregation: ones on
    kernel slots (sentinel one-hots already miss) and a validity mask on the
    overflow slots (their padded targets would otherwise clip-gather)."""
    plans = PairPlans.fromtuple(plan_arrays)
    sf = jnp.ones((np.prod(plans.fwd.rel_src.shape),), jnp.float32)
    sb = jnp.ones((np.prod(plans.bwd.rel_src.shape),), jnp.float32)
    so = (jnp.asarray(plans.ovf_tgt) < num_nodes).astype(jnp.float32)
    return sf, sb, so


def pair_normalisation_scales(plan_arrays, inv_flat: jnp.ndarray,
                              num_nodes: int, src_space: int = None):
    """Per-slot 1/deg-style scales for both directions + overflow.

    ``inv_flat`` is a [L*V] device array indexed by ``l * num_nodes + tgt``
    (the per-type in-degree normaliser of the fused message-passing path).
    """
    v = num_nodes
    if src_space is None:
        src_space = v
    plans = PairPlans.fromtuple(plan_arrays)

    srcabs, tgtabs, valid = pair_slot_abs_ids(plan_arrays, "fwd")
    ltype = srcabs // src_space
    sf = jnp.take(inv_flat, ltype * v + tgtabs, mode="clip") * valid

    srcabs_b, tgtabs_b, valid_b = pair_slot_abs_ids(plan_arrays, "bwd")
    ltype_b = tgtabs_b // src_space
    sb = jnp.take(inv_flat, ltype_b * v + srcabs_b, mode="clip") * valid_b

    ovf_src = jnp.asarray(plans.ovf_src)
    ovf_tgt = jnp.asarray(plans.ovf_tgt)
    ovf_valid = (ovf_tgt < v).astype(jnp.float32)
    ovf_l = ovf_src // src_space
    so = jnp.take(inv_flat, ovf_l * v + jnp.minimum(ovf_tgt, v - 1),
                  mode="clip") * ovf_valid
    return sf, sb, so


def _pad_cols(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    h = x.shape[-1]
    pad = (-h) % multiple
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def pair_kernel_table_bytes(rows: int, dtype) -> int:
    return rows * TILE * jnp.dtype(dtype).itemsize


def pair_kernel_applicable(rows: int, dtype) -> bool:
    """Static check: the resident table tile must fit the VMEM budget."""
    return pair_kernel_table_bytes(rows, dtype) <= VMEM_TABLE_BUDGET_BYTES


def _pair_spmm_device(table, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                      out_rows: int):
    """The Pallas kernel (TPU only; callers route interpret/CPU to the jnp
    fallback). ``table`` [rows, H]; returns f32 [out_rows, H].

    Feature tiling adapts to residency (round 5): when the WHOLE padded
    feature width fits the VMEM table budget (e.g. the backward kernel's
    [V, H] cotangent table — 6.2 MB at the bench shape), the kernel runs a
    single full-width sweep: one table DMA, one one-hot A build per chunk
    instead of ``h // TILE``, and a third of the grid steps. Larger tables
    keep the TILE-sized sweeps (the forward's [L*V, H] table exceeds the
    budget at the bench shape)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = table.shape[-1]
    table = _pad_cols(table, TILE)
    rows, h = table.shape
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    if rows * h * table.dtype.itemsize <= VMEM_TABLE_BUDGET_BYTES:
        tile = h  # full-width single sweep
    else:
        tile = TILE
    h_tiles = h // tile
    out_dtype = jnp.float32

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, scale_ref,
               table_hbm, zeros_ref, out_ref, table_vmem, copy_sem):
        del zeros_ref
        t = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            dma = pltpu.make_async_copy(
                table_hbm.at[:, pl.ds(t * tile, tile)], table_vmem, copy_sem
            )
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        contrib = jnp.zeros((BLK, tile), jnp.float32)
        for k in range(group):
            rel_t = rel_t_ref[k, :]
            rel_s = rel_s_ref[k, :]
            sc = scale_ref[k, :]
            oh_t = ((rows_i == rel_t[None, :]).astype(jnp.float32)
                    * sc[None, :]).astype(table_vmem.dtype)
            oh_s = (cols_i == rel_s[:, None]).astype(table_vmem.dtype)
            a = jnp.dot(oh_t, oh_s, preferred_element_type=jnp.float32)
            blk = src_blk_ref[g * group + k]
            tb = table_vmem[pl.ds(blk * BLK, BLK), :]
            contrib = contrib + jnp.dot(
                a.astype(table_vmem.dtype), tb,
                preferred_element_type=jnp.float32,
            )

        prev = grp_tgt_ref[jnp.maximum(g - 1, 0)]
        first = jnp.logical_or(g == 0, grp_tgt_ref[g] != prev)

        @pl.when(first)
        def _():
            out_ref[:, :] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, :] = out_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # src_blk, grp_tgt
        grid=(h_tiles, num_groups),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
            pl.BlockSpec((BLK, tile), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # zeros -> out alias
        ],
        out_specs=pl.BlockSpec((BLK, tile), lambda t, g, s, tb: (tb[g], t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, tile), table.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((out_rows, h), out_dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, h), out_dtype),
        input_output_aliases={6: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (BLK * E_C * BLK * h_tiles
                                    + BLK * BLK * h),
            bytes_accessed=rows * h * table.dtype.itemsize
            + num_chunks * E_C * 12 + out_rows * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), scale.reshape(num_chunks, E_C), table, zeros)
    return out[:, :orig_h]


def _pair_spmm_jnp(table, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                   out_rows: int):
    """Reference/CPU fallback with identical semantics (plan correctness is
    what CPU tests exercise; the Pallas kernel is equivalence-tested on TPU)."""
    srcabs, tgtabs, valid = slot_abs_ids(rel_src, rel_tgt, src_blk, grp_tgt)
    msgs = jnp.take(table, srcabs, axis=0, mode="clip").astype(jnp.float32)
    msgs = msgs * (scale.reshape(-1) * valid)[:, None]
    seg = jnp.where(valid, tgtabs, out_rows)
    return jax.ops.segment_sum(msgs, seg, num_segments=out_rows + 1)[:out_rows]


def pair_spmm(table, scale, rel_src, rel_tgt, src_blk, grp_tgt,
              out_rows: int, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return _pair_spmm_jnp(table, scale, rel_src, rel_tgt, src_blk,
                              grp_tgt, out_rows)
    return _pair_spmm_device(table, scale, rel_src, rel_tgt, src_blk,
                             grp_tgt, out_rows)


@partial(jax.custom_vjp, nondiff_argnums=(14,))
def pair_typed_gather_scatter(
    tables_flat: jnp.ndarray,   # [L*V, H] stacked per-type node tables
    scale_fwd: jnp.ndarray,     # f32 [C_f*E_C] per-slot weight (fwd slots)
    scale_bwd: jnp.ndarray,     # f32 [C_b*E_C] same weights in bwd slots
    ovf_scale: jnp.ndarray,     # f32 [OVF] weights of overflow edges (0 pad)
    rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,   # forward PairPlan
    rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,   # backward PairPlan
    ovf_src, ovf_tgt,
    num_nodes: int,
) -> jnp.ndarray:
    """Fused all-type SpMM via the block-pair kernel:
    ``out[v] = sum over edges e=(u -> v, type l) of scale_e * tables[l*V+u]``.

    Plan arrays ride as regular (non-differentiated) operands; pass them from
    ``PairPlans.astuple()``.
    """
    out = pair_spmm(tables_flat, scale_fwd, rel_src_f, rel_tgt_f, src_blk_f,
                    grp_tgt_f, num_nodes)
    if ovf_src.shape[0]:
        msgs = jnp.take(tables_flat, ovf_src, axis=0,
                        mode="clip").astype(jnp.float32)
        msgs = msgs * ovf_scale[:, None]
        out = out + jax.ops.segment_sum(
            msgs, ovf_tgt, num_segments=num_nodes + 1
        )[:num_nodes]
    return out


def _ptgs_fwd(tables_flat, scale_fwd, scale_bwd, ovf_scale,
              rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,
              rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,
              ovf_src, ovf_tgt, num_nodes):
    out = pair_typed_gather_scatter(
        tables_flat, scale_fwd, scale_bwd, ovf_scale,
        rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,
        rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,
        ovf_src, ovf_tgt, num_nodes,
    )
    # (zero-size dtype carrier: residual leaves must be JAX types)
    return out, (tables_flat.shape[0], jnp.zeros((0,), tables_flat.dtype),
                 scale_bwd, ovf_scale, rel_src_b, rel_tgt_b, src_blk_b,
                 grp_tgt_b, ovf_src, ovf_tgt)


def _ptgs_bwd(num_nodes, res, g):
    (rows, dtype_carrier, scale_bwd, ovf_scale, rel_src_b, rel_tgt_b,
     src_blk_b, grp_tgt_b, ovf_src, ovf_tgt) = res
    stream_dtype = dtype_carrier.dtype
    # Cotangents stream at the FORWARD table dtype (the same contract as
    # pair_attention's fused backward): with bf16 tables the gradient
    # gather reads half the bytes at the same MXU rounding the forward
    # already paid.
    d_tables = pair_spmm(g.astype(stream_dtype), scale_bwd, rel_src_b,
                         rel_tgt_b, src_blk_b, grp_tgt_b, rows)
    if ovf_src.shape[0]:
        # Transpose of the overflow term: d_tables[src] += scale * g[tgt].
        g_rows = jnp.take(g, ovf_tgt, axis=0, mode="clip")
        g_rows = g_rows * ovf_scale[:, None]
        d_tables = d_tables + jax.ops.segment_sum(
            g_rows, ovf_src, num_segments=rows
        )
    return (d_tables,) + (None,) * 13


pair_typed_gather_scatter.defvjp(_ptgs_fwd, _ptgs_bwd)


# ---------------------------------------------------------------------------
# Streamed per-type form: ONE launch over the concatenated per-type plans.
#
# The row-split path (QM9-scale graphs: merged [L*V] tables exceed the VMEM
# residency budget) used to launch the kernel once per edge type — 2L
# launches per MP layer. At QM9's run statistics (1-2 chunks per output
# run) grid steps equal runs either way, so those launches bought nothing
# and their per-launch overhead bound the config (PERFORMANCE.md round 3).
# Here the per-type plans CONCATENATE into one grid: output blocks are
# globalized to the stacked [L*V] row space, a per-group type id drives a
# re-DMA of the resident table slice (one [V, TILE] copy per (type,
# feature-tile) boundary — the same total bytes the per-type launches paid),
# and every direction runs in a single kernel launch.


def _pair_spmm_stream_device(tables, scale, rel_src, rel_tgt, src_blk,
                             grp_tgt_g, grp_type, v: int, out_rows: int):
    """tables [L*V, H] in HBM; resident slice re-DMA'd on type change.
    ``grp_tgt_g`` holds GLOBAL output blocks (ty * V/BLK + local block);
    ``src_blk`` stays LOCAL to the type's table slice."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = tables.shape[-1]
    tables = _pad_cols(tables, TILE)
    _, h = tables.shape
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt_g)
    num_groups = num_chunks // group
    # Adaptive feature tiling (round 5): the resident slice is ONE type's
    # [v, ...] rows — when the full padded width fits the VMEM budget, run
    # a single full-width sweep (one one-hot A build per chunk, a third of
    # the grid steps at the bench shape; same total DMA bytes).
    if v * h * tables.dtype.itemsize <= VMEM_TABLE_BUDGET_BYTES:
        tile = h
    else:
        tile = TILE
    h_tiles = h // tile
    out_dtype = jnp.float32

    def kernel(src_blk_ref, grp_tgt_ref, grp_type_ref, rel_s_ref, rel_t_ref,
               scale_ref, tables_hbm, zeros_ref, out_ref, table_vmem,
               copy_sem):
        del zeros_ref
        t = pl.program_id(0)
        g = pl.program_id(1)

        ty = grp_type_ref[g]
        prev_ty = grp_type_ref[jnp.maximum(g - 1, 0)]

        @pl.when(jnp.logical_or(g == 0, ty != prev_ty))
        def _():
            dma = pltpu.make_async_copy(
                tables_hbm.at[pl.ds(ty * v, v), pl.ds(t * tile, tile)],
                table_vmem, copy_sem,
            )
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        contrib = jnp.zeros((BLK, tile), jnp.float32)
        for k in range(group):
            rel_t = rel_t_ref[k, :]
            rel_s = rel_s_ref[k, :]
            sc = scale_ref[k, :]
            oh_t = ((rows_i == rel_t[None, :]).astype(jnp.float32)
                    * sc[None, :]).astype(table_vmem.dtype)
            oh_s = (cols_i == rel_s[:, None]).astype(table_vmem.dtype)
            a = jnp.dot(oh_t, oh_s, preferred_element_type=jnp.float32)
            blk = src_blk_ref[g * group + k]
            tb = table_vmem[pl.ds(blk * BLK, BLK), :]
            contrib = contrib + jnp.dot(
                a.astype(table_vmem.dtype), tb,
                preferred_element_type=jnp.float32,
            )

        prev = grp_tgt_ref[jnp.maximum(g - 1, 0)]
        first = jnp.logical_or(g == 0, grp_tgt_ref[g] != prev)

        @pl.when(first)
        def _():
            out_ref[:, :] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, :] = out_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # src_blk, grp_tgt_g, grp_type
        grid=(h_tiles, num_groups),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # tables stay in HBM
            pl.BlockSpec((BLK, tile), lambda t, g, s, tb, ty: (tb[g], t),
                         memory_space=pltpu.VMEM),  # zeros -> out alias
        ],
        out_specs=pl.BlockSpec((BLK, tile), lambda t, g, s, tb, ty: (tb[g], t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((v, tile), tables.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((out_rows, h), out_dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, h), out_dtype),
        input_output_aliases={7: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (BLK * E_C * BLK * h_tiles
                                    + BLK * BLK * h),
            bytes_accessed=tables.shape[0] * h * tables.dtype.itemsize
            + num_chunks * E_C * 12 + out_rows * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt_g), jnp.asarray(grp_type),
      jnp.asarray(rel_src), jnp.asarray(rel_tgt),
      scale.reshape(num_chunks, E_C), tables, zeros)
    return out[:, :orig_h]


def _stream_slot_abs_ids(rel_src, rel_tgt, src_blk, grp_tgt_g, grp_type,
                         v: int):
    """Global (src_row, out_row, valid) per slot of the streamed layout:
    sources globalize through the chunk's TYPE (``ty * V + src_blk * BLK +
    rel``), outputs through the already-global group block."""
    rel_s = jnp.asarray(rel_src).reshape(-1)
    rel_t = jnp.asarray(rel_tgt).reshape(-1)
    chunk = jnp.arange(rel_s.shape[0]) // E_C
    group = plan_group(src_blk, grp_tgt_g)
    ty = jnp.asarray(grp_type)[chunk // group]
    srcabs = (ty * v + jnp.asarray(src_blk)[chunk] * BLK
              + jnp.minimum(rel_s, BLK - 1))
    tgtabs = (jnp.asarray(grp_tgt_g)[chunk // group] * BLK
              + jnp.minimum(rel_t, BLK - 1))
    valid = (rel_s < BLK) & (rel_t < BLK)
    return srcabs, tgtabs, valid


def _pair_spmm_stream_jnp(tables, scale, rel_src, rel_tgt, src_blk,
                          grp_tgt_g, grp_type, v: int, out_rows: int):
    srcabs, tgtabs, valid = _stream_slot_abs_ids(
        rel_src, rel_tgt, src_blk, grp_tgt_g, grp_type, v)
    msgs = jnp.take(tables, srcabs, axis=0, mode="clip").astype(jnp.float32)
    msgs = msgs * (scale.reshape(-1) * valid)[:, None]
    seg = jnp.where(valid, tgtabs, out_rows)
    return jax.ops.segment_sum(msgs, seg, num_segments=out_rows + 1)[:out_rows]


def pair_spmm_stream(tables, scale, rel_src, rel_tgt, src_blk, grp_tgt_g,
                     grp_type, v: int, out_rows: int, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _pair_spmm_stream_jnp if interpret else _pair_spmm_stream_device
    return fn(tables, scale, rel_src, rel_tgt, src_blk, grp_tgt_g, grp_type,
              v, out_rows)


# -- JOINT-SUM streamed forward: whole-output VMEM window --------------------
#
# The joint sum over types used to materialise the per-type [L*Vo, H] f32
# aggregates (plus their zeros init) and reduce afterwards — ~126 MB of HBM
# traffic per QM9 layer for an [Vo, H] result. When the [Vo, tile] output
# window AND the per-type table slab fit VMEM together, this kernel keeps
# the WHOLE output resident across the launch (constant out index map),
# accumulates each group's contribution at its target block row offset, and
# writes the result back once. Types may revisit output blocks in any order
# (no run/first-visit logic — the window is always live).

JOINT_WINDOW_BUDGET_BYTES = 14 * 1024 * 1024


def pair_stream_joint_applicable(v_src: int, v_out: int, h_padded: int,
                                 table_dtype) -> bool:
    tile = (h_padded if v_src * h_padded * jnp.dtype(table_dtype).itemsize
            <= VMEM_TABLE_BUDGET_BYTES else TILE)
    window = v_out * tile * 4
    slab = v_src * tile * jnp.dtype(table_dtype).itemsize
    return window + slab <= JOINT_WINDOW_BUDGET_BYTES


def _pair_spmm_stream_joint_device(tables, scale, rel_src, rel_tgt, src_blk,
                                   grp_tgt_l, grp_type, v: int, v_out: int):
    """Like ``_pair_spmm_stream_device`` but ``grp_tgt_l`` holds LOCAL
    output blocks (no type offset) and the [v_out, tile] output stays
    VMEM-resident for the whole launch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = tables.shape[-1]
    tables = _pad_cols(tables, TILE)
    _, h = tables.shape
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt_l)
    num_groups = num_chunks // group
    if v * h * tables.dtype.itemsize <= VMEM_TABLE_BUDGET_BYTES:
        tile = h
    else:
        tile = TILE
    h_tiles = h // tile

    def kernel(src_blk_ref, grp_tgt_ref, grp_type_ref, rel_s_ref, rel_t_ref,
               scale_ref, tables_hbm, out_ref, table_vmem, copy_sem):
        t = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            out_ref[:, :] = jnp.zeros((v_out, tile), jnp.float32)

        ty = grp_type_ref[g]
        prev_ty = grp_type_ref[jnp.maximum(g - 1, 0)]

        @pl.when(jnp.logical_or(g == 0, ty != prev_ty))
        def _():
            dma = pltpu.make_async_copy(
                tables_hbm.at[pl.ds(ty * v, v), pl.ds(t * tile, tile)],
                table_vmem, copy_sem,
            )
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        contrib = jnp.zeros((BLK, tile), jnp.float32)
        for k in range(group):
            rel_t = rel_t_ref[k, :]
            rel_s = rel_s_ref[k, :]
            sc = scale_ref[k, :]
            oh_t = ((rows_i == rel_t[None, :]).astype(jnp.float32)
                    * sc[None, :]).astype(table_vmem.dtype)
            oh_s = (cols_i == rel_s[:, None]).astype(table_vmem.dtype)
            a = jnp.dot(oh_t, oh_s, preferred_element_type=jnp.float32)
            blk = src_blk_ref[g * group + k]
            tb = table_vmem[pl.ds(blk * BLK, BLK), :]
            contrib = contrib + jnp.dot(
                a.astype(table_vmem.dtype), tb,
                preferred_element_type=jnp.float32,
            )

        tgt = grp_tgt_ref[g]
        cur = out_ref[pl.ds(tgt * BLK, BLK), :]
        out_ref[pl.ds(tgt * BLK, BLK), :] = cur + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # src_blk, grp_tgt_l, grp_type
        grid=(h_tiles, num_groups),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # tables stay in HBM
        ],
        # Constant index over g: the whole [v_out, tile] window stays
        # resident; written back at each t boundary.
        out_specs=pl.BlockSpec((v_out, tile), lambda t, g, *s: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((v, tile), tables.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_out, h), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (BLK * E_C * BLK * h_tiles
                                    + BLK * BLK * h),
            bytes_accessed=tables.shape[0] * h * tables.dtype.itemsize
            + num_chunks * E_C * 12 + v_out * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt_l), jnp.asarray(grp_type),
      jnp.asarray(rel_src), jnp.asarray(rel_tgt),
      scale.reshape(num_chunks, E_C), tables)
    return out[:, :orig_h]


def _pair_spmm_stream_joint_jnp(tables, scale, rel_src, rel_tgt, src_blk,
                                grp_tgt_l, grp_type, v: int, v_out: int):
    srcabs, tgtabs, valid = _stream_slot_abs_ids(
        rel_src, rel_tgt, src_blk, grp_tgt_l, grp_type, v)
    msgs = jnp.take(tables, srcabs, axis=0, mode="clip").astype(jnp.float32)
    msgs = msgs * (scale.reshape(-1) * valid)[:, None]
    seg = jnp.where(valid, tgtabs, v_out)
    return jax.ops.segment_sum(msgs, seg, num_segments=v_out + 1)[:v_out]


def pair_spmm_stream_joint(tables, scale, rel_src, rel_tgt, src_blk,
                           grp_tgt_l, grp_type, v: int, v_out: int,
                           interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = (_pair_spmm_stream_joint_jnp if interpret
          else _pair_spmm_stream_joint_device)
    return fn(tables, scale, rel_src, rel_tgt, src_blk, grp_tgt_l, grp_type,
              v, v_out)


@partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def pair_stream_gather_scatter(
    tables_flat: jnp.ndarray,   # [L*Vs, H] stacked per-type node tables
    scale_fwd: jnp.ndarray,     # f32 [C_f*E_C] per-slot weight (fwd slots)
    scale_bwd: jnp.ndarray,     # f32 [C_b*E_C] same weights in bwd slots
    ovf_scale: jnp.ndarray,     # f32 [OVF] weights of overflow edges (0 pad)
    rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f, grp_type_f,  # streamed fwd
    rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, grp_type_b,  # streamed bwd
    ovf_src, ovf_tgt,           # GLOBAL row ids (sentinel tgt = L*Vo)
    v_src: int,                 # per-type SOURCE rows (ext space under halo)
    v_out: int,                 # per-type OUTPUT rows (local targets)
) -> jnp.ndarray:
    """Per-type aggregates over the streamed concatenated plans:
    ``out[l*Vo + t] = sum over type-l edges (u -> t) of scale_e *
    tables[l*Vs + u]`` as f32 [L*Vo, H] — the row-split form's 2L launches
    collapsed to one per direction. Build the plan arrays with
    ``concat_typed_plans``."""
    num_types = tables_flat.shape[0] // v_src
    out_rows = num_types * v_out
    out = pair_spmm_stream(tables_flat, scale_fwd, rel_src_f, rel_tgt_f,
                           src_blk_f, grp_tgt_f, grp_type_f, v_src, out_rows)
    if ovf_src.shape[0]:
        msgs = jnp.take(tables_flat, ovf_src, axis=0,
                        mode="clip").astype(jnp.float32)
        msgs = msgs * ovf_scale[:, None]
        out = out + jax.ops.segment_sum(
            msgs, ovf_tgt, num_segments=out_rows + 1
        )[:out_rows]
    return out


def _psgs_fwd(tables_flat, scale_fwd, scale_bwd, ovf_scale,
              rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f, grp_type_f,
              rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, grp_type_b,
              ovf_src, ovf_tgt, v_src, v_out):
    out = pair_stream_gather_scatter(
        tables_flat, scale_fwd, scale_bwd, ovf_scale,
        rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f, grp_type_f,
        rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, grp_type_b,
        ovf_src, ovf_tgt, v_src, v_out,
    )
    return out, (jnp.zeros((0,), tables_flat.dtype), scale_bwd, ovf_scale,
                 rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, grp_type_b,
                 ovf_src, ovf_tgt)


def _psgs_bwd(v_src, v_out, res, g):
    (dtype_carrier, scale_bwd, ovf_scale, rel_src_b, rel_tgt_b, src_blk_b,
     grp_tgt_b, grp_type_b, ovf_src, ovf_tgt) = res
    num_types = g.shape[0] // v_out
    rows = num_types * v_src
    # Transposed stream: the resident slice is the cotangent's type slab
    # (v_out rows), the outputs are the stacked source rows.
    d_tables = pair_spmm_stream(g.astype(dtype_carrier.dtype), scale_bwd,
                                rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,
                                grp_type_b, v_out, rows)
    if ovf_src.shape[0]:
        g_rows = jnp.take(g, jnp.minimum(ovf_tgt, rows - 1), axis=0,
                          mode="clip")
        g_rows = g_rows * ovf_scale[:, None]
        d_tables = d_tables + jax.ops.segment_sum(
            g_rows, ovf_src, num_segments=rows
        )
    return (d_tables,) + (None,) * 15


pair_stream_gather_scatter.defvjp(_psgs_fwd, _psgs_bwd)


def concat_typed_plans(plans_typed, v_src: int, v_out: int,
                       normalize: bool):
    """Concatenate per-type ``PairPlans.astuple()`` tuples into the streamed
    layout: (scales, fwd arrays + grp_type, bwd arrays + grp_type, global
    overflow ids). Forward output blocks globalize to the stacked [L*Vo]
    target row space, backward output blocks to the stacked [L*Vs] source
    row space; per-slot scales come from the host-precomputed ``inv_*``
    (normalize) or unit scales. All types must share each direction's grid
    group (the dataset builds them with one ``pair_group_*`` config)."""
    num_types = len(plans_typed)
    gf = plan_group(plans_typed[0][2], plans_typed[0][3])
    gb = plan_group(plans_typed[0][6], plans_typed[0][7])
    for ty, p in enumerate(plans_typed[1:], start=1):
        got = (plan_group(p[2], p[3]), plan_group(p[6], p[7]))
        if got != (gf, gb):
            # Not an assert: under python -O mismatched groups would
            # silently misindex slots (advisor r4).
            raise ValueError(
                f"concat_typed_plans: type {ty} plan groups {got} differ "
                f"from type 0's ({gf}, {gb}); build every per-type plan "
                "with one shared (group_fwd, group_bwd) config."
            )

    def cat(i):
        return jnp.concatenate([jnp.asarray(p[i]) for p in plans_typed])

    def cat_groups(i, out_blocks):
        parts, types = [], []
        for ty, p in enumerate(plans_typed):
            arr = jnp.asarray(p[i])
            parts.append(arr + ty * out_blocks)
            types.append(jnp.full(arr.shape, ty, jnp.int32))
        return jnp.concatenate(parts), jnp.concatenate(types)

    grp_tgt_f, grp_type_f = cat_groups(3, v_out // BLK)
    grp_tgt_b, grp_type_b = cat_groups(7, v_src // BLK)

    ovf_srcs, ovf_tgts, ovf_scales = [], [], []
    for ty, p in enumerate(plans_typed):
        o_src = jnp.asarray(p[8])
        o_tgt = jnp.asarray(p[9])
        ovf_srcs.append(ty * v_src + o_src)
        # Per-type sentinel (== v_out) maps to the global discard row
        # L*Vo — NOT ty*v_out + v_out, a real row of the next type.
        ovf_tgts.append(jnp.where(o_tgt >= v_out, num_types * v_out,
                                  ty * v_out + o_tgt))
        if normalize:
            ovf_scales.append(jnp.asarray(p[12]))
        else:
            ovf_scales.append((o_tgt < v_out).astype(jnp.float32))
    if normalize:
        scale_fwd, scale_bwd = cat(10), cat(11)
    else:
        scale_fwd = jnp.ones((sum(np.prod(p[0].shape) for p in plans_typed),),
                             jnp.float32)
        scale_bwd = jnp.ones((sum(np.prod(p[4].shape) for p in plans_typed),),
                             jnp.float32)
    return (scale_fwd, scale_bwd, jnp.concatenate(ovf_scales),
            cat(0), cat(1), cat(2), grp_tgt_f, grp_type_f,
            cat(4), cat(5), cat(6), grp_tgt_b, grp_type_b,
            jnp.concatenate(ovf_srcs), jnp.concatenate(ovf_tgts))


def pair_stream_from_typed(tables_flat, plans_typed, v_out: int,
                           normalize: bool):
    """Row-split per-type aggregates [L*Vo, H] in ONE launch per direction
    (replaces the per-type kernel loop — QM9's 2L launches per layer).
    ``tables_flat`` may span a larger per-type source row space (SPMD-halo
    ext rows) than the local target rows ``v_out``."""
    v_src = tables_flat.shape[0] // len(plans_typed)
    args = concat_typed_plans(plans_typed, v_src, v_out, normalize)
    return pair_stream_gather_scatter(tables_flat, *args, v_src, v_out)


@partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18))
def pair_stream_joint(
    tables_flat: jnp.ndarray,   # [L*Vs, H] stacked per-type node tables
    scale_fwd, scale_bwd, ovf_scale,
    rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_fl, grp_type_f,  # fwd, LOCAL tgts
    rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, type_b_zeros,  # bwd
    ovf_src, ovf_tgt_l,          # global src rows; LOCAL ovf targets
    v_src: int, v_out: int, num_types: int,
) -> jnp.ndarray:
    """JOINT sum over types, [Vo, H] f32: ``out[t] = sum over ALL edges
    (u -> t, type l) of scale_e * tables[l*Vs + u]``.

    vs ``pair_stream_from_typed(...).reshape(L, Vo, -1).sum(0)`` this
    (a) keeps the forward output fully VMEM-resident when it fits
    (``pair_stream_joint_applicable``) — no [L*Vo, H] materialisation, no
    zeros init, no reduce pass — and (b) feeds the backward the
    UN-broadcast [Vo, H] cotangent (``type_b_zeros``: every bwd group
    reads the same single resident slab), eliminating the L-fold
    cotangent broadcast the sum's VJP would emit."""
    on_tpu = jax.default_backend() == "tpu"
    h_pad = tables_flat.shape[1] + (-tables_flat.shape[1]) % TILE
    if not on_tpu:
        out = _pair_spmm_stream_joint_jnp(
            tables_flat, scale_fwd, rel_src_f, rel_tgt_f, src_blk_f,
            grp_tgt_fl, grp_type_f, v_src, v_out)
    elif pair_stream_joint_applicable(v_src, v_out, h_pad,
                                      tables_flat.dtype):
        out = _pair_spmm_stream_joint_device(
            tables_flat, scale_fwd, rel_src_f, rel_tgt_f, src_blk_f,
            grp_tgt_fl, grp_type_f, v_src, v_out)
    else:
        # Window too large (e.g. PPI's [8064, 384] f32 + slab): per-type
        # streamed forward + reduce — the bwd half still avoids the
        # broadcast.
        grp_tgt_g = jnp.asarray(grp_tgt_fl) + (jnp.asarray(grp_type_f)
                                               * (v_out // BLK))
        out = _pair_spmm_stream_device(
            tables_flat, scale_fwd, rel_src_f, rel_tgt_f, src_blk_f,
            grp_tgt_g, grp_type_f, v_src, num_types * v_out)
        out = out.reshape(num_types, v_out, -1).sum(axis=0)
    if ovf_src.shape[0]:
        msgs = jnp.take(tables_flat, ovf_src, axis=0,
                        mode="clip").astype(jnp.float32)
        msgs = msgs * ovf_scale[:, None]
        out = out + jax.ops.segment_sum(
            msgs, ovf_tgt_l, num_segments=v_out + 1
        )[:v_out]
    return out


def _psj_fwd(tables_flat, scale_fwd, scale_bwd, ovf_scale,
             rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_fl, grp_type_f,
             rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, type_b_zeros,
             ovf_src, ovf_tgt_l, v_src, v_out, num_types):
    out = pair_stream_joint(
        tables_flat, scale_fwd, scale_bwd, ovf_scale,
        rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_fl, grp_type_f,
        rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, type_b_zeros,
        ovf_src, ovf_tgt_l, v_src, v_out, num_types,
    )
    return out, (jnp.zeros((0,), tables_flat.dtype), scale_bwd, ovf_scale,
                 rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, type_b_zeros,
                 ovf_src, ovf_tgt_l)


def _psj_bwd(v_src, v_out, num_types, res, g):
    (dtype_carrier, scale_bwd, ovf_scale, rel_src_b, rel_tgt_b, src_blk_b,
     grp_tgt_b, type_b_zeros, ovf_src, ovf_tgt_l) = res
    rows = num_types * v_src
    # ONE resident slab: type ids are all zero, so the kernel DMAs the
    # [Vo, H] cotangent once and every type's bwd groups gather from it.
    d_tables = pair_spmm_stream(g.astype(dtype_carrier.dtype), scale_bwd,
                                rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,
                                type_b_zeros, v_out, rows)
    if ovf_src.shape[0]:
        g_rows = jnp.take(g, jnp.minimum(ovf_tgt_l, v_out - 1), axis=0,
                          mode="clip")
        g_rows = g_rows * ovf_scale[:, None]
        d_tables = d_tables + jax.ops.segment_sum(
            g_rows, ovf_src, num_segments=rows
        )
    return (d_tables,) + (None,) * 15


pair_stream_joint.defvjp(_psj_fwd, _psj_bwd)


def pair_stream_joint_from_typed(tables_flat, plans_typed, v_out: int,
                                 normalize: bool):
    """Joint [Vo, H] sum over per-type plans — the typed analog of the
    merged plans' joint form, without the per-type materialisation or the
    backward cotangent broadcast (see ``pair_stream_joint``)."""
    num_types = len(plans_typed)
    v_src = tables_flat.shape[0] // num_types
    (sf, sb, so, rsf, rtf, sbf, gtf, gyf, rsb, rtb, sbb, gtb, gyb,
     osrc, otgt) = concat_typed_plans(plans_typed, v_src, v_out, normalize)
    # Localize the forward output blocks / overflow targets (sentinel
    # rows carry zero scales, so clipping them to the pad row is safe).
    gtf_l = jnp.asarray(gtf) - jnp.asarray(gyf) * (v_out // BLK)
    otgt_l = jnp.where(jnp.asarray(otgt) >= num_types * v_out, v_out,
                       jnp.asarray(otgt) % v_out)
    return pair_stream_joint(
        tables_flat, sf, sb, so, rsf, rtf, sbf, gtf_l, gyf,
        rsb, rtb, sbb, gtb, jnp.zeros_like(jnp.asarray(gyb)),
        osrc, otgt_l, v_src, v_out, num_types,
    )
