"""Block-pair kernel for the target-state edge MLP with ONE hidden layer —
the reference's DEFAULT GNN_Edge_MLP configuration
(tf2_gnn/layers/message_passing/gnn_edge_mlp.py:48-52:
``use_target_state_as_input=True, num_edge_MLP_hidden_layers=1``).

The fused form computed here (see gnn_edge_mlp.py
``_fused_target_state_one_hidden`` for the derivation — TypedLinear is
bias-free so the last linear commutes with sum aggregation):

    R[t] = sum over edges e=(u -> t') of  s_e * relu(A[src_e] + B[t]),
    out[v] = sum_l W2_l @ R[l*V + v],

with ``A = W1_src h`` over the stacked per-type SOURCE row space [L*S, H]
and ``B = W1_tgt h`` over the MERGED-TARGET row space [L*V, H] — which is
exactly the output row space of a merged-target pair plan
(ops/pair_spmm.py::build_pair_plans(merge_targets=True)).

Why a dedicated kernel: the commuted-W2 scatter-plan path still pays one
per-edge z-value gather stream plus L type-masked scatters (67.2 ms/step at
the PPI bench shape vs 13.9 ms for the 0-hidden sibling — PERFORMANCE.md
round 3). Here edge space never touches HBM at all:

* FORWARD rides the pair_spmm footprint exactly: A's feature tile stays
  resident in VMEM (one DMA per tile pass); B streams one [BLK, TILE] slab
  per grid step through the SAME block index as the output ref (its row
  space IS the output row space). Per chunk, three MXU passes:

      Ag   = onehot(rel_src)  @ A[src_block]       # gather sources
      Bg   = onehot(rel_tgt)  @ B_slab             # gather targets
      out += onehot(rel_tgt)^T @ (relu(Ag+Bg) * s)  # scatter

* BACKWARD: ``dB[t] = M[t] * g[t]`` with ``M = sum_e s_e * mask_e`` — and
  M is emitted BY the training forward (``_relu_pair_fwd_m_device``: one
  extra scatter dot per chunk alongside R, same sweep), so no fwd-order
  kernel runs in the backward at all. The one backward kernel is the dA
  pass (backward plan order): B AND g resident (two stream-dtype feature
  tiles — 2 x 6.2 MB bf16 at the PPI shape), A streamed per grid step
  through the output block index; per chunk four MXU passes (gather g,
  gather B, gather A for the in-register mask recompute, scatter
  ``s * mask * g[tgt]``). The eval/primal forward keeps the plain 3-dot
  sweep without M.

Callers gate on ``pair_edge_mlp_applicable`` (single-table residency for
the forward + dual residency for the dA pass) and fall back to the
scatter-plan path above the budget.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .pair_spmm import (
    BLK,
    E_C,
    TILE,
    VMEM_TABLE_BUDGET_BYTES,
    _pad_cols,
    pair_kernel_table_bytes,
    plan_group,
    slot_abs_ids,
)

# The dA pass holds TWO feature tiles resident (B and the cotangent stream).
# Budget chosen so the shipped PPI shape (L*V = 24192 rows, bf16: 2 x 6.2 MB)
# fits alongside the streamed slabs and plan blocks.
VMEM_DUAL_TABLE_BUDGET_BYTES = 13 * 1024 * 1024


def pair_edge_mlp_applicable(rows_a: int, rows_b: int, dtype) -> bool:
    """Static residency gate: the forward/dB passes keep A's feature tile
    resident (rows_a); the dA pass keeps B + cotangent tiles resident
    (2 x rows_b)."""
    return (
        pair_kernel_table_bytes(rows_a, dtype) <= VMEM_TABLE_BUDGET_BYTES
        and 2 * pair_kernel_table_bytes(rows_b, dtype)
        <= VMEM_DUAL_TABLE_BUDGET_BYTES
    )


# ---------------------------------------------------------------------------
# Device kernels


def _relu_pair_fwd_device(a, b, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                          out_rows: int):
    """R[t] = sum over fwd-plan slots with target t of
    scale * relu(a[src] + b[t]); f32 [out_rows, H]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = a.shape[-1]
    a = _pad_cols(a, TILE)
    b = _pad_cols(b, TILE)
    rows_a, h = a.shape
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    h_tiles = h // TILE
    stream_dtype = a.dtype

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, scale_ref,
               a_hbm, b_ref, zeros_ref, out_ref, a_vmem, copy_sem):
        del zeros_ref
        t = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            dma = pltpu.make_async_copy(
                a_hbm.at[:, pl.ds(t * TILE, TILE)], a_vmem, copy_sem
            )
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        b_slab = b_ref[:]
        contrib = jnp.zeros((BLK, TILE), jnp.float32)
        for k in range(group):
            rel_s = rel_s_ref[k, :]
            rel_t = rel_t_ref[k, :]
            sc = scale_ref[k, :]
            oh_gs = (cols_i == rel_s[:, None]).astype(stream_dtype)
            blk = src_blk_ref[g * group + k]
            ag = jnp.dot(oh_gs, a_vmem[pl.ds(blk * BLK, BLK), :],
                         preferred_element_type=jnp.float32)
            oh_gt = (cols_i == rel_t[:, None]).astype(stream_dtype)
            bg = jnp.dot(oh_gt, b_slab, preferred_element_type=jnp.float32)
            r = jnp.maximum(ag + bg, 0.0) * sc[:, None]
            oh_st = (rows_i == rel_t[None, :]).astype(stream_dtype)
            contrib = contrib + jnp.dot(
                oh_st, r.astype(stream_dtype),
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
            pl.BlockSpec(memory_space=pltpu.ANY),  # A stays in HBM
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # B slab (= out block)
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # zeros -> out alias
        ],
        out_specs=pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_a, TILE), stream_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((out_rows, h), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, h), jnp.float32),
        input_output_aliases={7: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * 3 * BLK * E_C * TILE * h_tiles,
            bytes_accessed=(rows_a + 2 * out_rows) * h
            * jnp.dtype(stream_dtype).itemsize
            + num_chunks * E_C * 12 + out_rows * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), scale.reshape(num_chunks, E_C), a, b, zeros)
    return out[:, :orig_h]


def _relu_pair_fwd_m_device(a, b, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                            out_rows: int):
    """Fused training forward: R[t] (as ``_relu_pair_fwd_device``) AND the
    mask aggregate ``M[t] = sum over fwd-plan slots with target t of
    scale * (a[src] + b[t] > 0)`` in ONE sweep — the dB cotangent is then
    just ``M * g`` (XLA elementwise), so the backward's separate fwd-order
    kernel (which would recompute z via two more gather dots per chunk)
    disappears. One extra scatter dot per chunk over the plain forward."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = a.shape[-1]
    a = _pad_cols(a, TILE)
    b = _pad_cols(b, TILE)
    rows_a, h = a.shape
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    h_tiles = h // TILE
    stream_dtype = a.dtype

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, scale_ref,
               a_hbm, b_ref, zeros_r_ref, zeros_m_ref, out_ref, m_ref,
               a_vmem, copy_sem):
        del zeros_r_ref, zeros_m_ref
        t = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            dma = pltpu.make_async_copy(
                a_hbm.at[:, pl.ds(t * TILE, TILE)], a_vmem, copy_sem
            )
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        b_slab = b_ref[:]
        contrib = jnp.zeros((BLK, TILE), jnp.float32)
        contrib_m = jnp.zeros((BLK, TILE), jnp.float32)
        for k in range(group):
            rel_s = rel_s_ref[k, :]
            rel_t = rel_t_ref[k, :]
            sc = scale_ref[k, :]
            oh_gs = (cols_i == rel_s[:, None]).astype(stream_dtype)
            blk = src_blk_ref[g * group + k]
            ag = jnp.dot(oh_gs, a_vmem[pl.ds(blk * BLK, BLK), :],
                         preferred_element_type=jnp.float32)
            oh_gt = (cols_i == rel_t[:, None]).astype(stream_dtype)
            bg = jnp.dot(oh_gt, b_slab, preferred_element_type=jnp.float32)
            z = ag + bg
            r = jnp.maximum(z, 0.0) * sc[:, None]
            mask = jnp.where(z > 0.0, sc[:, None], 0.0)
            oh_st = (rows_i == rel_t[None, :]).astype(stream_dtype)
            contrib = contrib + jnp.dot(
                oh_st, r.astype(stream_dtype),
                preferred_element_type=jnp.float32,
            )
            contrib_m = contrib_m + jnp.dot(
                oh_st, mask.astype(stream_dtype),
                preferred_element_type=jnp.float32,
            )

        prev = grp_tgt_ref[jnp.maximum(g - 1, 0)]
        first = jnp.logical_or(g == 0, grp_tgt_ref[g] != prev)

        @pl.when(first)
        def _():
            out_ref[:, :] = contrib
            m_ref[:, :] = contrib_m

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, :] = out_ref[:, :] + contrib
            m_ref[:, :] = m_ref[:, :] + contrib_m

    out_block = pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                             memory_space=pltpu.VMEM)
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
            pl.BlockSpec(memory_space=pltpu.ANY),  # A stays in HBM
            out_block,  # B slab (= out block)
            out_block,  # zeros -> out alias
            out_block,  # zeros -> m alias
        ],
        out_specs=[out_block, out_block],
        scratch_shapes=[
            pltpu.VMEM((rows_a, TILE), stream_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((out_rows, h), jnp.float32)
    out, m = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_rows, h), jnp.float32),
                   jax.ShapeDtypeStruct((out_rows, h), jnp.float32)],
        input_output_aliases={7: 0, 8: 1},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * 4 * BLK * E_C * TILE * h_tiles,
            bytes_accessed=(rows_a + 2 * out_rows) * h
            * jnp.dtype(stream_dtype).itemsize
            + num_chunks * E_C * 12 + 2 * out_rows * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), scale.reshape(num_chunks, E_C), a, b, zeros,
      zeros)
    return out[:, :orig_h], m[:, :orig_h]


def _relu_pair_db_device(a, b, g, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                         out_rows: int):
    """dB[t] = g[t] * sum over fwd-plan slots with target t of
    scale * (a[src] + b[t] > 0); f32 [out_rows, H]. Mask recomputed
    in-register (A resident, B and g streamed through the out index)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = a.shape[-1]
    a = _pad_cols(a, TILE)
    b = _pad_cols(b, TILE)
    g = _pad_cols(g, TILE)
    rows_a, h = a.shape
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    h_tiles = h // TILE
    stream_dtype = a.dtype

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, scale_ref,
               a_hbm, b_ref, g_ref, zeros_ref, out_ref, a_vmem, copy_sem):
        del zeros_ref
        t = pl.program_id(0)
        gi = pl.program_id(1)

        @pl.when(gi == 0)
        def _():
            dma = pltpu.make_async_copy(
                a_hbm.at[:, pl.ds(t * TILE, TILE)], a_vmem, copy_sem
            )
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        b_slab = b_ref[:]
        contrib = jnp.zeros((BLK, TILE), jnp.float32)
        for k in range(group):
            rel_s = rel_s_ref[k, :]
            rel_t = rel_t_ref[k, :]
            sc = scale_ref[k, :]
            oh_gs = (cols_i == rel_s[:, None]).astype(stream_dtype)
            blk = src_blk_ref[gi * group + k]
            ag = jnp.dot(oh_gs, a_vmem[pl.ds(blk * BLK, BLK), :],
                         preferred_element_type=jnp.float32)
            oh_gt = (cols_i == rel_t[:, None]).astype(stream_dtype)
            bg = jnp.dot(oh_gt, b_slab, preferred_element_type=jnp.float32)
            mask = jnp.where(ag + bg > 0.0, sc[:, None], 0.0)
            oh_st = (rows_i == rel_t[None, :]).astype(stream_dtype)
            contrib = contrib + jnp.dot(
                oh_st, mask.astype(stream_dtype),
                preferred_element_type=jnp.float32,
            )
        # dB accumulates M * g; g is constant per output block so the
        # multiply distributes over block revisits.
        contrib = contrib * g_ref[:].astype(jnp.float32)

        prev = grp_tgt_ref[jnp.maximum(gi - 1, 0)]
        first = jnp.logical_or(gi == 0, grp_tgt_ref[gi] != prev)

        @pl.when(first)
        def _():
            out_ref[:, :] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, :] = out_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h_tiles, num_groups),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # A stays in HBM
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # B slab
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # g slab
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # zeros -> out alias
        ],
        out_specs=pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_a, TILE), stream_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((out_rows, h), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, h), jnp.float32),
        input_output_aliases={8: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * 3 * BLK * E_C * TILE * h_tiles,
            bytes_accessed=(rows_a + 2 * out_rows) * h
            * jnp.dtype(stream_dtype).itemsize
            + num_chunks * E_C * 12 + out_rows * h * (4 + 4),
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), scale.reshape(num_chunks, E_C), a, b,
      g.astype(stream_dtype), zeros)
    return out[:, :orig_h]


def _relu_pair_da_device(a, b, g, scale_bwd, rel_src, rel_tgt, src_blk,
                         grp_tgt, rows_a: int):
    """dA[u] = sum over bwd-plan slots with source u of
    scale * (a[u] + b[tgt] > 0) * g[tgt]; f32 [rows_a, H].

    Backward-plan slot semantics: the plan's "source" space is the ORIGINAL
    target rows (indexes B and g, both resident), its "target"/output space
    is A's rows (A streamed per grid step through the output block index).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = a.shape[-1]
    a = _pad_cols(a, TILE)
    b = _pad_cols(b, TILE)
    g = _pad_cols(g, TILE)
    rows_b, h = b.shape
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    h_tiles = h // TILE
    stream_dtype = a.dtype

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, scale_ref,
               b_hbm, g_hbm, a_ref, zeros_ref, out_ref, b_vmem, g_vmem,
               copy_sems):
        del zeros_ref
        t = pl.program_id(0)
        gi = pl.program_id(1)

        @pl.when(gi == 0)
        def _():
            dma_b = pltpu.make_async_copy(
                b_hbm.at[:, pl.ds(t * TILE, TILE)], b_vmem, copy_sems.at[0]
            )
            dma_g = pltpu.make_async_copy(
                g_hbm.at[:, pl.ds(t * TILE, TILE)], g_vmem, copy_sems.at[1]
            )
            dma_b.start()
            dma_g.start()
            dma_b.wait()
            dma_g.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        a_slab = a_ref[:]
        contrib = jnp.zeros((BLK, TILE), jnp.float32)
        for k in range(group):
            rel_s = rel_s_ref[k, :]   # rows in B/g (original targets)
            rel_t = rel_t_ref[k, :]   # rows in A slab (original sources)
            sc = scale_ref[k, :]
            oh_g = (cols_i == rel_s[:, None]).astype(stream_dtype)
            blk = src_blk_ref[gi * group + k]
            gg = jnp.dot(oh_g, g_vmem[pl.ds(blk * BLK, BLK), :],
                         preferred_element_type=jnp.float32)
            bg = jnp.dot(oh_g, b_vmem[pl.ds(blk * BLK, BLK), :],
                         preferred_element_type=jnp.float32)
            oh_a = (cols_i == rel_t[:, None]).astype(stream_dtype)
            ag = jnp.dot(oh_a, a_slab, preferred_element_type=jnp.float32)
            val = jnp.where(ag + bg > 0.0, gg, 0.0) * sc[:, None]
            oh_at = (rows_i == rel_t[None, :]).astype(stream_dtype)
            contrib = contrib + jnp.dot(
                oh_at, val.astype(stream_dtype),
                preferred_element_type=jnp.float32,
            )

        prev = grp_tgt_ref[jnp.maximum(gi - 1, 0)]
        first = jnp.logical_or(gi == 0, grp_tgt_ref[gi] != prev)

        @pl.when(first)
        def _():
            out_ref[:, :] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, :] = out_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h_tiles, num_groups),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # B stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # g stays in HBM
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # A slab (= out block)
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),  # zeros -> out alias
        ],
        out_specs=pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_b, TILE), stream_dtype),
            pltpu.VMEM((rows_b, TILE), stream_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros = jnp.zeros((rows_a, h), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_a, h), jnp.float32),
        input_output_aliases={8: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * 4 * BLK * E_C * TILE * h_tiles,
            bytes_accessed=(2 * rows_b + 2 * rows_a) * h
            * jnp.dtype(stream_dtype).itemsize
            + num_chunks * E_C * 12 + rows_a * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), scale_bwd.reshape(num_chunks, E_C), b,
      g.astype(stream_dtype), a, zeros)
    return out[:, :orig_h]


# ---------------------------------------------------------------------------
# jnp twins (CPU tests / interpret mode — identical semantics)


def _relu_pair_fwd_jnp(a, b, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                       out_rows: int):
    srcabs, tgtabs, valid = slot_abs_ids(rel_src, rel_tgt, src_blk, grp_tgt)
    av = jnp.take(a, srcabs, axis=0, mode="clip").astype(jnp.float32)
    bv = jnp.take(b, tgtabs, axis=0, mode="clip").astype(jnp.float32)
    r = jnp.maximum(av + bv, 0.0) * (scale.reshape(-1) * valid)[:, None]
    seg = jnp.where(valid, tgtabs, out_rows)
    return jax.ops.segment_sum(r, seg, num_segments=out_rows + 1)[:out_rows]


def _relu_pair_fwd_m_jnp(a, b, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                         out_rows: int):
    srcabs, tgtabs, valid = slot_abs_ids(rel_src, rel_tgt, src_blk, grp_tgt)
    av = jnp.take(a, srcabs, axis=0, mode="clip").astype(jnp.float32)
    bv = jnp.take(b, tgtabs, axis=0, mode="clip").astype(jnp.float32)
    z = av + bv
    w = (scale.reshape(-1) * valid)[:, None]
    seg = jnp.where(valid, tgtabs, out_rows)
    out = jax.ops.segment_sum(jnp.maximum(z, 0.0) * w, seg,
                              num_segments=out_rows + 1)[:out_rows]
    m = jax.ops.segment_sum((z > 0.0) * w, seg,
                            num_segments=out_rows + 1)[:out_rows]
    return out, m


def _relu_pair_db_jnp(a, b, g, scale, rel_src, rel_tgt, src_blk, grp_tgt,
                      out_rows: int):
    srcabs, tgtabs, valid = slot_abs_ids(rel_src, rel_tgt, src_blk, grp_tgt)
    av = jnp.take(a, srcabs, axis=0, mode="clip").astype(jnp.float32)
    bv = jnp.take(b, tgtabs, axis=0, mode="clip").astype(jnp.float32)
    mask = (av + bv > 0.0) * (scale.reshape(-1) * valid)[:, None]
    seg = jnp.where(valid, tgtabs, out_rows)
    m = jax.ops.segment_sum(mask, seg, num_segments=out_rows + 1)[:out_rows]
    return m * g.astype(jnp.float32)


def _relu_pair_da_jnp(a, b, g, scale_bwd, rel_src, rel_tgt, src_blk, grp_tgt,
                      rows_a: int):
    # Backward plan: "source" space = original targets, output = A rows.
    tgtabs, srcabs_a, valid = slot_abs_ids(rel_src, rel_tgt, src_blk, grp_tgt)
    av = jnp.take(a, srcabs_a, axis=0, mode="clip").astype(jnp.float32)
    bv = jnp.take(b, tgtabs, axis=0, mode="clip").astype(jnp.float32)
    gv = jnp.take(g, tgtabs, axis=0, mode="clip").astype(jnp.float32)
    val = jnp.where(av + bv > 0.0, gv, 0.0) \
        * (scale_bwd.reshape(-1) * valid)[:, None]
    seg = jnp.where(valid, srcabs_a, rows_a)
    return jax.ops.segment_sum(val, seg, num_segments=rows_a + 1)[:rows_a]


def _dispatch(device_fn, jnp_fn, *args, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return (jnp_fn if interpret else device_fn)(*args)


# ---------------------------------------------------------------------------
# The differentiable op


@partial(jax.custom_vjp, nondiff_argnums=(15,))
def pair_relu_mlp_aggregate(
    a: jnp.ndarray,             # [L*S, H] stacked per-type source halves
    b: jnp.ndarray,             # [L*V, H] target halves, MERGED-TARGET layout
    scale_fwd: jnp.ndarray,     # f32 [C_f*E_C] per-slot weight (fwd slots)
    scale_bwd: jnp.ndarray,     # f32 [C_b*E_C] same weights in bwd slots
    ovf_scale: jnp.ndarray,     # f32 [OVF] weights of overflow edges (0 pad)
    rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,   # forward PairPlan
    rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,   # backward PairPlan
    ovf_src, ovf_tgt,
    out_rows: int,
) -> jnp.ndarray:
    """Per-type relu-MLP aggregates over MERGED-TARGET pair plans:
    ``R[t] = sum over edges e with merged target t of
    scale_e * relu(a[src_e] + b[t])`` as f32 [out_rows, H].

    Plan arrays ride as regular (non-differentiated) operands; pass them
    from ``PairPlans.astuple()`` built with ``merge_targets=True``.
    """
    out = _dispatch(_relu_pair_fwd_device, _relu_pair_fwd_jnp,
                    a, b, scale_fwd, rel_src_f, rel_tgt_f, src_blk_f,
                    grp_tgt_f, out_rows)
    if ovf_src.shape[0]:
        av = jnp.take(a, ovf_src, axis=0, mode="clip").astype(jnp.float32)
        bv = jnp.take(b, jnp.minimum(ovf_tgt, out_rows - 1), axis=0,
                      mode="clip").astype(jnp.float32)
        r = jnp.maximum(av + bv, 0.0) * ovf_scale[:, None]
        out = out + jax.ops.segment_sum(
            r, ovf_tgt, num_segments=out_rows + 1
        )[:out_rows]
    return out


def _prma_fwd(a, b, scale_fwd, scale_bwd, ovf_scale,
              rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,
              rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,
              ovf_src, ovf_tgt, out_rows):
    # Training forward: the fused (R, M) sweep — M = sum of s * (z > 0) per
    # output row — makes the backward's dB a plain elementwise M * g, so no
    # fwd-order kernel runs in the backward at all. The eval/primal path
    # (pair_relu_mlp_aggregate) keeps the 3-dot forward without M.
    out, m = _dispatch(_relu_pair_fwd_m_device, _relu_pair_fwd_m_jnp,
                       a, b, scale_fwd, rel_src_f, rel_tgt_f, src_blk_f,
                       grp_tgt_f, out_rows)
    if ovf_src.shape[0]:
        av = jnp.take(a, ovf_src, axis=0, mode="clip").astype(jnp.float32)
        bv = jnp.take(b, jnp.minimum(ovf_tgt, out_rows - 1), axis=0,
                      mode="clip").astype(jnp.float32)
        r = jnp.maximum(av + bv, 0.0) * ovf_scale[:, None]
        out = out + jax.ops.segment_sum(
            r, ovf_tgt, num_segments=out_rows + 1
        )[:out_rows]
    return out, (a, b, m, scale_bwd, ovf_scale,
                 rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,
                 ovf_src, ovf_tgt)


def _prma_bwd(out_rows, res, g):
    (a, b, m, scale_bwd, ovf_scale,
     rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,
     ovf_src, ovf_tgt) = res
    rows_a = a.shape[0]
    d_b = m * g.astype(jnp.float32)
    d_a = _dispatch(_relu_pair_da_device, _relu_pair_da_jnp,
                    a, b, g, scale_bwd, rel_src_b, rel_tgt_b, src_blk_b,
                    grp_tgt_b, rows_a)
    if ovf_src.shape[0]:
        av = jnp.take(a, ovf_src, axis=0, mode="clip").astype(jnp.float32)
        tgt_c = jnp.minimum(ovf_tgt, out_rows - 1)
        bv = jnp.take(b, tgt_c, axis=0, mode="clip").astype(jnp.float32)
        gv = jnp.take(g, tgt_c, axis=0, mode="clip").astype(jnp.float32)
        val = jnp.where(av + bv > 0.0, gv, 0.0) * ovf_scale[:, None]
        d_a = d_a + jax.ops.segment_sum(val, ovf_src, num_segments=rows_a)
        d_b = d_b + jax.ops.segment_sum(
            val, ovf_tgt, num_segments=out_rows + 1
        )[:out_rows]
    return (d_a, d_b) + (None,) * 13


pair_relu_mlp_aggregate.defvjp(_prma_fwd, _prma_bwd)
