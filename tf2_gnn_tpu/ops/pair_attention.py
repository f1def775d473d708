"""Flash-style RGAT attention on the block-pair plan structure.

Replaces the sorted-scatter RGAT pipeline (XLA bundled gather + Pallas
segment-max + XLA max-gather + ``attention_scatter``) with pair-structured
kernels that never leave the chunk layout and never row-gather on XLA:

* ``_max_kernel``   (fwd, grouped): per-(target, head) running max of the
  LeakyReLU logits, reading both score halves from ONE VMEM-resident packed
  score table ``[L*V, 2K]`` (columns 0..K-1 source halves, K..2K-1 target
  halves — both live in the merged ``l*V + node`` row space).
* ``_expd_kernel``  (fwd, grouped): materialises per-slot
  ``expd = exp(leaky(p) - max[tgt])`` and the LeakyReLU slope in forward
  slot order for the aggregation kernel. Streaming this compact [slots, W]
  f32 array through HBM (~46 MB/layer round trip) was MEASURED 2.75x
  faster than recomputing expd in-register inside every feature-tile sweep
  of the aggregation kernel (13.5 vs 2.0+2.9 ms/layer at the PPI bench
  shape): the narrow score-gather dots repeat h_tiles times and dominate.
* ``_agg_kernel``   (fwd, grouped): the pair SpMM generalised to per-slot
  PER-HEAD scales — one pass emits softmax denominators [V, K] AND
  exp-weighted message sums [V, H] with the message table feature tile
  resident in VMEM. Messages use the HK-MAJOR head layout (column
  ``hd*K + k``) so a ``pltpu.repeat`` of the K expd columns aligns.
* ``_bwd_fused`` (bwd, grouped): ONE pass over the backward plan emits all
  three gradients — d_src_scores and d_table through per-group output
  blocks (backward groups share a source-row block), d_tgt_scores through
  a small transposed VMEM accumulator flushed at the end. Everything the
  pass needs rides the two gathers it already performs: the d_denom
  cotangent and the softmax statistics come through AUGMENTED tables —
  ones / source-score columns appended to the message table, tiled
  d_denom / max-stabiliser / per-type target-score columns appended to
  the cotangent table — so expd and the LeakyReLU slope are recomputed
  in-register from the bundled gathers (no expd stream through HBM, no
  separate backward expd kernel).

Edges that spilled the pair-chunk budget contribute through an XLA overflow
term INSIDE the custom VJP (they participate in the same softmax).

Semantics replicate reference rgat.py:91-163 (scores ``LeakyReLU(a_l_k .
concat(src, tgt))``, softmax per target over all edge types jointly,
exp-weighted sum per head); the score decomposition into node-space tables
is the classic GAT trick already used by layers/message_passing/rgat.py.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pair_spmm import BLK, E_C, plan_group, slot_abs_ids

TILE = 128
NEG = -1e30
LEAKY_SLOPE = 0.2
# MXU f32 dots default to bf16 input truncation; the narrow softmax-statistic
# dots (score gathers, max gathers, denominators — all [., BLK] @ [BLK, K]
# with tiny K) run at HIGHEST so logits/expd/denom are bit-exact vs the jnp
# twins. The wide [., H] message dots keep the default (the shipped pipeline
# streams bf16 messages anyway).
EXACT = jax.lax.Precision.HIGHEST


def _prec(dtype):
    """Wide-dot precision policy: f32 streams get HIGHEST (bit-exact vs the
    jnp twins, 3x MXU passes); bf16 streams (the shipped config) use the
    default single pass — bf16 inputs are exact on the MXU, so the only
    rounding is the explicit cast of the scaled-message operand."""
    return EXACT if jnp.dtype(dtype) == jnp.float32 else None


# Lane width of the streamed per-slot expd/slope arrays (the K head columns
# tiled up to ACC_W lanes, column w = head w % K) and of the transposed
# VMEM accumulators (d_ts / denom). Measured trade-off (2026-08-17, PPI
# bench): pallas operands are COMPACT {1,0} in HBM, so narrow streams are
# 8x less traffic than TILE-wide ones (wide f32: +51 ms/step, wide bf16:
# +23 ms/step from pack/unpack relayouts); the ~3 us/step block-load
# relayout of a 16-lane block is the cheaper price. W=4 is not an option:
# Mosaic charges narrow-lane INPUT blocks ~(lane-128 array size)/W of
# scoped VMEM stack, and W=4 blew the 16 MiB limit by ~20 MiB.
ACC_W = 16


def _expd_width(num_heads: int) -> int:
    return max(ACC_W, num_heads)


# Resident VMEM budgets (bytes): the max/expd kernels hold the packed score
# table (+ maxes), the aggregation sweep holds the message-table feature
# tile + the per-node denominator accumulator, and the fused backward holds
# the augmented cotangent table + the transposed d_ts accumulator. Each
# leaves headroom out of the 16 MiB VMEM for blocks, streams and Mosaic's
# scoped stack.
SCORE_BUDGET_BYTES = 12 * 1024 * 1024
TABLE_BUDGET_BYTES = 11 * 1024 * 1024
RESIDENT_BUDGET_BYTES = 13 * 1024 * 1024


def pair_attention_applicable(rows: int, num_nodes: int, hidden_dim: int,
                              num_heads: int, table_dtype,
                              score_dtype, src_space: int = None) -> bool:
    """Static check for the fused pair-attention path. ``src_space`` is one
    type's source-row count in the packed tables (ext under SPMD-halo)."""
    if num_heads <= 0 or hidden_dim % num_heads or TILE % num_heads:
        return False
    # The kernels tile the K head columns up to ACC_W lanes
    # (pltpu.repeat(e_k, ACC_W // k)) and the fused backward's augmented
    # layout requires _expd_width(k) == ACC_W. K=16 additionally blows
    # Mosaic's 16 MiB scoped-VMEM stack at production scale (measured
    # 2026-08-19: the max kernel's narrow [BLK, 16] output windowing OOMs
    # by 5.8 MiB at rows=24k) — heads above 8 fall back to the
    # sorted-scatter path.
    if num_heads > min(ACC_W, 8):
        return False
    vs_check = num_nodes if src_space is None else src_space
    if num_nodes % BLK or vs_check % BLK or rows % vs_check:
        return False
    t_item = jnp.dtype(table_dtype).itemsize
    s_item = jnp.dtype(score_dtype).itemsize
    # VMEM residency is 128-lane physical regardless of logical width.
    score_resident = rows * 128 * s_item
    maxes_resident = num_nodes * 128 * 4
    if score_resident + maxes_resident > SCORE_BUDGET_BYTES:
        return False  # max / expd kernels
    table_tile = rows * TILE * t_item
    den_resident = ACC_W * num_nodes * 4
    if table_tile + den_resident > TABLE_BUDGET_BYTES:
        return False  # aggregation kernel (expd arrives as a stream)
    vs = num_nodes if src_space is None else src_space
    num_types = max(rows // max(vs, 1), 1)
    extra = ACC_W + _expd_width(num_heads) + num_heads * num_types
    haug = max(-(-(hidden_dim + extra) // TILE) * TILE, TILE)
    dw_resident = num_nodes * haug * t_item
    dts_resident = ACC_W * rows * 4
    return dw_resident + dts_resident <= RESIDENT_BUDGET_BYTES  # fused bwd


def _pad_cols(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    pad = (-x.shape[-1]) % multiple
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


# Single shared decode of the plan layout (pair_spmm.slot_abs_ids).
_slot_ids_jnp = slot_abs_ids


def _slot_logits_jnp(scores, rel_src, rel_tgt, src_blk, grp_tgt,
                     num_nodes: int, swap: bool, src_space: int = None):
    """Per-slot (pre-activation p, logit, tgt node, src row, valid) on one
    plan direction. ``swap=True`` reads a BACKWARD plan, whose plan-"src"
    role is the original target node and plan-"tgt" role the source row.
    ``src_space`` is one edge type's source-row count in the packed scores
    table (the ext halo row space under SPMD; num_nodes otherwise)."""
    a_abs, b_abs, valid = _slot_ids_jnp(rel_src, rel_tgt, src_blk, grp_tgt)
    if swap:
        src_rows, tgt_nodes = b_abs, a_abs
    else:
        src_rows, tgt_nodes = a_abs, b_abs
    k = scores.shape[1] // 2
    vs = num_nodes if src_space is None else src_space
    ltype = src_rows // vs
    ss = jnp.take(scores, src_rows, axis=0, mode="clip")[:, :k]
    ts = jnp.take(scores, ltype * vs + tgt_nodes, axis=0, mode="clip")[:, k:]
    p = ss.astype(jnp.float32) + ts.astype(jnp.float32)
    logit = jnp.where(p >= 0, p, LEAKY_SLOPE * p)
    return p, logit, tgt_nodes, src_rows, valid


# ---------------------------------------------------------------------------
# Kernel A1: per-(target, head) max of the logits (forward plan, grouped).
# ---------------------------------------------------------------------------

def _max_kernel_device(scores, rel_src, rel_tgt, src_blk, grp_tgt,
                       num_nodes: int, num_heads: int,
                       src_space: int = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = scores.shape[0]
    k2 = scores.shape[1]
    k = num_heads
    v = num_nodes
    vs = v if src_space is None else src_space
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    vs_blocks = vs // BLK

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, scores_hbm,
               neg_ref, out_ref, sc_vmem, copy_sem):
        del neg_ref
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            dma = pltpu.make_async_copy(scores_hbm, sc_vmem, copy_sem)
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        m_local = jnp.full((BLK, k), NEG, jnp.float32)
        for c in range(group):
            rel_s = rel_s_ref[c, :]
            rel_t = rel_t_ref[c, :]
            sblk = src_blk_ref[g * group + c]
            tsb = (sblk * BLK // vs) * vs_blocks + grp_tgt_ref[g]
            oh_s = (cols_i == rel_s[:, None]).astype(sc_vmem.dtype)
            oh_tT = (cols_i == rel_t[:, None]).astype(sc_vmem.dtype)
            ss = jnp.dot(oh_s, sc_vmem[pl.ds(sblk * BLK, BLK), :],
                         preferred_element_type=jnp.float32,
                         precision=_prec(sc_vmem.dtype))[:, :k]
            ts = jnp.dot(oh_tT, sc_vmem[pl.ds(tsb * BLK, BLK), :],
                         preferred_element_type=jnp.float32,
                         precision=_prec(sc_vmem.dtype))[:, k:2 * k]
            p = ss + ts
            logit = jnp.where(p >= 0, p, LEAKY_SLOPE * p)
            # 2D comparisons: a 1D i1 vector cannot get a minor dim inserted
            # (Mosaic supports that reshape only for 32-bit types).
            valid = (rel_s[:, None] < BLK) & (rel_t[:, None] < BLK)
            logit = jnp.where(valid, logit, NEG)
            oh_t_bool = rows_i == rel_t[None, :]
            cols = []
            for h in range(k):
                lk = logit[:, h][None, :]  # [1, E_C] -> bcast over BLK rows
                cols.append(jnp.max(
                    jnp.where(oh_t_bool, lk, NEG), axis=1))
            m_local = jnp.maximum(m_local, jnp.stack(cols, axis=1))

        prev = grp_tgt_ref[jnp.maximum(g - 1, 0)]
        first = jnp.logical_or(g == 0, grp_tgt_ref[g] != prev)

        @pl.when(first)
        def _():
            out_ref[:, :] = m_local

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, :] = jnp.maximum(out_ref[:, :], m_local)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_groups,),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed scores stay in HBM
            pl.BlockSpec((BLK, k), lambda g, s, tb: (tb[g], 0),
                         memory_space=pltpu.VMEM),  # neg -> out alias
        ],
        out_specs=pl.BlockSpec((BLK, k), lambda g, s, tb: (tb[g], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, k2), scores.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    neg = jnp.full((v, k), NEG, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, k), jnp.float32),
        input_output_aliases={5: 0},
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), scores, neg)


def _max_kernel_jnp(scores, rel_src, rel_tgt, src_blk, grp_tgt,
                    num_nodes: int, num_heads: int, src_space: int = None):
    del num_heads
    _, logit, tgt, _, valid = _slot_logits_jnp(
        scores, rel_src, rel_tgt, src_blk, grp_tgt, num_nodes, swap=False,
        src_space=src_space)
    logit = jnp.where(valid[:, None], logit, NEG)
    seg = jnp.where(valid, tgt, num_nodes)
    return jax.ops.segment_max(
        logit, seg, num_segments=num_nodes + 1
    )[:num_nodes]


def pair_attention_max(scores, rel_src, rel_tgt, src_blk, grp_tgt,
                       num_nodes: int, num_heads: int, interpret=None,
                       src_space: int = None):
    """[V, K] per-(target, head) max logit over the plan's kernel slots
    (NEG on targets with no in-edges)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _max_kernel_jnp if interpret else _max_kernel_device
    out = fn(scores, rel_src, rel_tgt, src_blk, grp_tgt, num_nodes, num_heads,
             src_space=src_space)
    if interpret:
        # segment_max leaves -inf/zeros mix; normalise empty targets to NEG.
        out = jnp.maximum(out, NEG)
    return out


# ---------------------------------------------------------------------------
# Kernel A2: per-slot expd + LeakyReLU slope, either plan direction.
# ---------------------------------------------------------------------------

def _expd_kernel_device(scores, maxes, rel_src, rel_tgt, src_blk, grp_tgt,
                        num_nodes: int, num_heads: int, swap: bool,
                        with_slope: bool, src_space: int = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = scores.shape[0]
    k2 = scores.shape[1]
    k = num_heads
    w = _expd_width(k)
    v = num_nodes
    vs = v if src_space is None else src_space
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    vs_blocks = vs // BLK

    # ONE wide augmented score table [rows, 3W] (48 lanes for the shipped
    # K=4 — still a single 128-lane VMEM tile, so it costs the same 6.2 MB
    # the old narrow [rows, 2K] scratch already paid in lane padding, vs
    # 3x that for three separate W-wide scratches, which blew Mosaic's
    # 16 MiB scoped-VMEM stack at bench scale). Lanes: ss | ts | stabiliser,
    # every K-column group pre-tiled to the stream width W OUTSIDE the
    # kernel (the stabiliser additionally tiled over the type axis so any
    # type slab at target t carries maxes[t]). The per-chunk gather dots
    # then produce stream-width results directly and ALL vector math runs
    # wide — the old narrow [E_C, K] ops plus the per-chunk pltpu.repeat
    # lane-relayout (the measured dominant cost: 786 ns/chunk vs
    # pair_spmm's 110 on the same chunk structure) are gone; the ts/mx
    # sections peel off the target-row dot with cheap in-vreg lane shifts.
    # _stabilise already rounded the maxes to the stream dtype, so storing
    # them at scores.dtype is exact.
    num_types = rows // vs
    rep = w // k
    # The stabiliser slab must align with the ts rows (l * vs + t): pad the
    # [v, K] maxes to vs rows before tiling over the type axis (the padded
    # halo rows are never gathered — target rel ids stay < v).
    mx_rows = maxes.astype(scores.dtype)
    if vs != v:
        mx_rows = jnp.pad(mx_rows, ((0, vs - v), (0, 0)))
    aug = jnp.concatenate(
        [jnp.tile(scores[:, :k], (1, rep)),
         jnp.tile(scores[:, k:2 * k], (1, rep)),
         jnp.tile(jnp.tile(mx_rows, (num_types, 1)), (1, rep))],
        axis=1,
    )

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, aug_hbm,
               *out_and_scratch):
        if with_slope:
            expd_ref, slope_ref = out_and_scratch[:2]
            sc_vmem, sem1 = out_and_scratch[2:]
        else:
            expd_ref = out_and_scratch[0]
            slope_ref = None
            sc_vmem, sem1 = out_and_scratch[1:]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            dma1 = pltpu.make_async_copy(aug_hbm, sc_vmem, sem1)
            dma1.start()
            dma1.wait()

        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        for c in range(group):
            rel_s = rel_s_ref[c, :]
            rel_t = rel_t_ref[c, :]
            if swap:
                # Backward plan: plan-"src" = target node, plan-"tgt" = row.
                u_blk = (grp_tgt_ref[g]).astype(jnp.int32)
                v_blk = src_blk_ref[g * group + c]
                rel_u, rel_v = rel_t, rel_s
            else:
                u_blk = src_blk_ref[g * group + c]
                v_blk = grp_tgt_ref[g]
                rel_u, rel_v = rel_s, rel_t
            tsb = (u_blk * BLK // vs) * vs_blocks + v_blk
            oh_u = (cols_i == rel_u[:, None]).astype(sc_vmem.dtype)
            oh_v = (cols_i == rel_v[:, None]).astype(sc_vmem.dtype)
            # Transposed-lhs contractions put SLOTS ON LANES: results are
            # [3W, E_C] — one f32 vreg pair per W-section instead of 16
            # sublane-majority vregs, and the stream stores are lane-dense.
            du = jax.lax.dot_general(
                sc_vmem[pl.ds(u_blk * BLK, BLK), :], oh_u,
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(sc_vmem.dtype))
            dv = jax.lax.dot_general(
                sc_vmem[pl.ds(tsb * BLK, BLK), :], oh_v,
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(sc_vmem.dtype))
            p = du[:w, :] + dv[w:2 * w, :]
            mx = dv[2 * w:3 * w, :]
            logit = jnp.where(p >= 0, p, LEAKY_SLOPE * p)
            valid = (rel_s[None, :] < BLK) & (rel_t[None, :] < BLK)
            expd_ref[:, pl.ds(c * E_C, E_C)] = jnp.where(
                valid, jnp.exp(logit - mx), 0.0)
            if with_slope:
                slope_ref[:, pl.ds(c * E_C, E_C)] = jnp.where(
                    p >= 0, 1.0, LEAKY_SLOPE)

    stream_spec = pl.BlockSpec((w, group * E_C), lambda g, *s: (0, g),
                               memory_space=pltpu.VMEM)
    stream_shape = jax.ShapeDtypeStruct((w, num_chunks * E_C), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_groups,),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=((stream_spec, stream_spec) if with_slope
                   else (stream_spec,)),
        scratch_shapes=[
            pltpu.VMEM((rows, 3 * w), scores.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=((stream_shape, stream_shape) if with_slope
                   else (stream_shape,)),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), aug)
    return out if with_slope else (out[0], None)


def _expd_kernel_jnp(scores, maxes, rel_src, rel_tgt, src_blk, grp_tgt,
                     num_nodes: int, num_heads: int, swap: bool,
                     with_slope: bool, src_space: int = None):
    w = _expd_width(num_heads)
    p, logit, tgt, _, valid = _slot_logits_jnp(
        scores, rel_src, rel_tgt, src_blk, grp_tgt, num_nodes, swap=swap,
        src_space=src_space)
    mx = jnp.take(maxes, tgt, axis=0, mode="clip")
    expd = jnp.where(valid[:, None], jnp.exp(logit - mx), 0.0)
    rep = w // num_heads
    if not with_slope:
        return jnp.tile(expd, (1, rep)).T, None
    # Contract: slope is 1.0 on invalid slots (the device kernel's all-zero
    # one-hot rows give p = 0 there); consumers multiply by expd = 0 anyway.
    slope = jnp.where(jnp.logical_and(valid[:, None], p < 0),
                      LEAKY_SLOPE, 1.0)
    return jnp.tile(expd, (1, rep)).T, jnp.tile(slope, (1, rep)).T


def pair_attention_expd(scores, maxes, rel_src, rel_tgt, src_blk, grp_tgt,
                        num_nodes: int, num_heads: int, swap: bool = False,
                        interpret=None, with_slope: bool = True,
                        src_space: int = None):
    """Per-slot (expd, slope) in the slot order of the given plan direction,
    TRANSPOSED f32 ``[W, slots]`` with W = _expd_width(K) (row r = head
    ``r % K``). Slots-on-lanes keeps the stream lane-DENSE (the old
    [slots, W] form burned 128-lane tiles on W=16 columns), shrinks the
    in-kernel vector math from 16 sublane-majority vregs to one vreg pair
    per section, and makes each head's per-slot scale for the head-major
    pair_spmm launches a CONTIGUOUS row slice instead of a strided column
    copy. ``maxes`` must already include overflow-edge contributions.
    ``with_slope=False`` drops the slope output entirely (slope is None):
    Pallas outputs are not DCE'd, so a consumer that never reads the slope
    (the production forward — the fused backward recomputes it in-register)
    would otherwise pay its full HBM write traffic (~23 MB/layer at the PPI
    bench shape)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _expd_kernel_jnp if interpret else _expd_kernel_device
    return fn(scores, maxes, rel_src, rel_tgt, src_blk, grp_tgt,
              num_nodes, num_heads, swap, with_slope, src_space=src_space)

# ---------------------------------------------------------------------------
# Kernel B: softmax denominators + exp-weighted message sums (forward plan,
# grouped, message-table feature tile resident).
# ---------------------------------------------------------------------------

def _agg_kernel_device(table, expd, rel_src, rel_tgt, src_blk, grp_tgt,
                       num_nodes: int, num_heads: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = table.shape[-1]
    table = _pad_cols(table, TILE)
    rows, h = table.shape
    k = num_heads
    w = _expd_width(k)
    v = num_nodes
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    h_tiles = h // TILE

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, expd_ref,
               table_hbm, zeros_w_ref, weighted_ref, denom_t_ref,
               table_vmem, den_acc, copy_sem):
        del zeros_w_ref
        t = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            dma = pltpu.make_async_copy(
                table_hbm.at[:, pl.ds(t * TILE, TILE)], table_vmem, copy_sem
            )
            dma.start()

            @pl.when(t == 0)
            def _():
                den_acc[:, :] = jnp.zeros_like(den_acc)

            dma.wait()

        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        tb = grp_tgt_ref[g]
        w_contrib = jnp.zeros((BLK, TILE), jnp.float32)
        for c in range(group):
            rel_s = rel_s_ref[c, :]
            rel_t = rel_t_ref[c, :]
            e_c = expd_ref[pl.ds(c * E_C, E_C), :]  # [E_C, W] f32
            oh_s = (cols_i == rel_s[:, None]).astype(table_vmem.dtype)
            blk = src_blk_ref[g * group + c]
            msgs = jnp.dot(oh_s, table_vmem[pl.ds(blk * BLK, BLK), :],
                           preferred_element_type=jnp.float32,
                           precision=_prec(table_vmem.dtype))
            scaled = (msgs * pltpu.repeat(e_c, TILE // w, axis=1)
                      ).astype(table_vmem.dtype)
            oh_tv = (cols_i == rel_t[:, None]).astype(table_vmem.dtype)
            w_contrib = w_contrib + jax.lax.dot_general(
                oh_tv, scaled, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(table_vmem.dtype))

            # Softmax denominators: accumulate transposed ([ACC_W, V] keeps
            # the resident scratch at ACC_W sublanes) during the first
            # feature-tile sweep only.
            @pl.when(t == 0)
            def _():
                e_n = e_c[:, :ACC_W]
                # Contract the slot axes directly (transposed-lhs matmul).
                d_t = jax.lax.dot_general(
                    e_n, oh_tv.astype(jnp.float32), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=EXACT)                    # [ACC_W, BLK]
                den_acc[:, pl.ds(tb * BLK, BLK)] = (
                    den_acc[:, pl.ds(tb * BLK, BLK)] + d_t)

        prev = grp_tgt_ref[jnp.maximum(g - 1, 0)]
        first = jnp.logical_or(g == 0, grp_tgt_ref[g] != prev)

        @pl.when(first)
        def _():
            weighted_ref[:, :] = w_contrib

        @pl.when(jnp.logical_not(first))
        def _():
            weighted_ref[:, :] = weighted_ref[:, :] + w_contrib

        @pl.when(jnp.logical_and(t == h_tiles - 1, g == num_groups - 1))
        def _():
            denom_t_ref[:, :] = den_acc[:, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h_tiles, num_groups),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * E_C, w), lambda t, g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),   # zeros -> weighted alias
        ],
        out_specs=(
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ACC_W, v), lambda t, g, *s: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, TILE), table.dtype),
            pltpu.VMEM((ACC_W, v), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros_w = jnp.zeros((v, h), jnp.float32)
    weighted, denom_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((v, h), jnp.float32),
            jax.ShapeDtypeStruct((ACC_W, v), jnp.float32),
        ),
        input_output_aliases={6: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (2 * BLK * E_C * TILE) * h_tiles,
            # The expd stream is always f32 (4 bytes/lane) regardless of the
            # table dtype.
            bytes_accessed=rows * h * table.dtype.itemsize
            + num_chunks * E_C * (8 + w * 4) + v * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), expd, table, zeros_w)
    return denom_t.T[:, :k], weighted[:, :orig_h]


def _agg_kernel_jnp(table, expd, rel_src, rel_tgt, src_blk, grp_tgt,
                    num_nodes: int, num_heads: int):
    srcabs, tgtabs, valid = _slot_ids_jnp(rel_src, rel_tgt, src_blk, grp_tgt)
    head_dim = table.shape[1] // num_heads
    msgs = jnp.take(table, srcabs, axis=0, mode="clip").astype(jnp.float32)
    e = expd[:, :num_heads] * valid[:, None]
    seg = jnp.where(valid, tgtabs, num_nodes)
    weighted = jax.ops.segment_sum(
        msgs * jnp.tile(e, (1, head_dim)), seg, num_segments=num_nodes + 1
    )[:num_nodes]
    denom = jax.ops.segment_sum(
        e, seg, num_segments=num_nodes + 1
    )[:num_nodes]
    return denom, weighted


def pair_attention_agg(table, expd, rel_src, rel_tgt, src_blk, grp_tgt,
                       num_nodes: int, num_heads: int, interpret=None):
    """(denom [V, K], weighted [V, H]) — softmax denominators and
    exp-weighted hk-major message sums over the forward plan's slots.
    ``expd`` is in the EXPD_W-wide streamed layout."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _agg_kernel_jnp if interpret else _agg_kernel_device
    return fn(table, expd, rel_src, rel_tgt, src_blk, grp_tgt,
              num_nodes, num_heads)


# ---------------------------------------------------------------------------
# Kernel C (fused backward): one grouped pass over the BACKWARD plan emits
# all three gradients. Backward-plan groups share a SOURCE-row block, so
# d_src_scores and d_table stream through consecutively-revisited output
# blocks; d_tgt_scores accumulates into a small VMEM-resident transposed
# scratch ([W, L*V] f32, ~1.5 MiB at the PPI bench shape) flushed on the
# last grid step. This replaces three kernels (per-chunk d-score fwd,
# per-chunk d-score bwd, grouped d-table) whose ~7500 combined grid steps
# were pure per-step overhead (~4 us each, measured 2026-08-17).
#
# The d_denom cotangent rides an AUGMENTED cotangent table: the caller
# appends W columns of tiled d_denom to d_weighted and W columns of ones to
# the message table, so ddg arrives through the same one-hot gather as dwg
# and the head-sum matrix maps it straight into de.
# ---------------------------------------------------------------------------

def _bwd_fused_device(table, d_weighted, d_denom, scores, maxes,
                      rel_src, rel_tgt, src_blk, grp_tgt,
                      num_nodes: int, num_heads: int,
                      src_space: int = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_h = table.shape[-1]
    k = num_heads
    w = _expd_width(k)
    aw = ACC_W
    v = num_nodes
    vs = v if src_space is None else src_space
    vs_blocks = vs // BLK
    num_chunks = rel_src.shape[0]
    group = plan_group(src_blk, grp_tgt)
    num_groups = num_chunks // group
    num_types = table.shape[0] // vs

    # Augment: the kernel's two one-hot gathers (source rows from the table,
    # target rows from the cotangent) carry EVERYTHING the pass needs, so
    # expd/slope never touch HBM. Table side: ACC_W ones-columns at ``h``
    # (the d_denom ride-along) + the K source-score columns. Cotangent side:
    # the ACC_W-tiled d_denom + the K max stabilisers + L per-type
    # target-score slabs (the edge type is group-constant, so the kernel
    # selects its slab with a predicated sum). The aug columns reuse the
    # lane-tile padding when wide enough (hidden 320 pads to 384, leaving
    # 64 spare >= 16+4+3*4 at the bench shape) — else one tile is appended.
    stream_dtype = table.dtype
    h = table.shape[1]
    rep = w // k
    ss_base = h + aw
    ts_base = ss_base + w
    # ss (table side) and the stabiliser (cotangent side) ride their
    # gathers TILED TO THE STREAM WIDTH W, so the in-kernel expd/slope
    # recompute runs wide from the start — the old per-chunk narrow
    # [E_C, K] math and two of the three pltpu.repeat lane-relayouts (the
    # measured cost class of the old expd kernel) disappear. The per-type
    # ts slabs stay K-narrow (W-wide slabs would blow the spare lane-tile
    # budget); their predicated pick is the one remaining small repeat.
    # (ss and mx occupy the SAME lane offsets of their respective tables,
    # so one W-slab covers both sides.)
    extra = aw + w + num_types * k
    haug = max(((h + extra + TILE - 1) // TILE) * TILE, TILE)
    table_aug = jnp.concatenate(
        [table,
         jnp.ones((table.shape[0], aw), stream_dtype),
         jnp.tile(scores[:, :k].astype(stream_dtype), (1, rep)),
         jnp.zeros((table.shape[0], haug - ts_base), stream_dtype)], axis=1)
    ts_slabs = (scores[:, k:2 * k].astype(stream_dtype)
                .reshape(num_types, vs, k)[:, :v]
                .transpose(1, 0, 2).reshape(v, num_types * k))
    dw_aug = jnp.concatenate(
        [d_weighted.astype(stream_dtype)[:, :h],
         jnp.tile(d_denom, (1, aw // k)).astype(stream_dtype),
         jnp.tile(maxes.astype(stream_dtype), (1, rep)),
         ts_slabs,
         jnp.zeros((v, haug - ts_base - num_types * k), stream_dtype)],
        axis=1)
    # Head-sum matrix over the augmented width (de is stream-wide): message
    # column hd*K + j belongs to head j, so pm maps it into every output
    # column of head j; augmented column h + j feeds ddg into exactly the
    # output columns with col % ACC_W == j (one j per column, no double
    # counting since K divides ACC_W).
    cols = np.arange(haug)
    pm = (cols[:, None] % k == np.arange(w)[None, :] % k).astype(np.float32)
    pm[h:, :] = 0.0
    pm[h:h + aw, :] = (np.arange(aw)[:, None]
                       == np.arange(w)[None, :] % aw)
    assert w == aw

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref,
               table_blk_ref, dw_hbm, p_ref, zeros_ss_ref,
               zeros_tab_ref, dss_ref, dtab_ref, dts_ref,
               dw_vmem, dts_acc, copy_sem):
        del zeros_ss_ref, zeros_tab_ref
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            dma = pltpu.make_async_copy(dw_hbm, dw_vmem, copy_sem)
            dma.start()
            dts_acc[:, :] = jnp.zeros_like(dts_acc)
            dma.wait()

        u_blk = grp_tgt_ref[g]                 # merged source-row block
        ltype = u_blk * BLK // vs              # edge type (group-constant)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        ss_contrib = jnp.zeros((BLK, w), jnp.float32)
        tab_contrib = jnp.zeros((BLK, haug), jnp.float32)
        rep_tab = haug // w
        for c in range(group):
            rel_v = rel_s_ref[c, :]   # plan-"src" = original target node
            rel_u = rel_t_ref[c, :]   # plan-"tgt" = original source row
            v_blk = src_blk_ref[g * group + c]
            oh_v = (cols_i == rel_v[:, None]).astype(stream_dtype)
            oh_u = (cols_i == rel_u[:, None]).astype(stream_dtype)
            dwg = jnp.dot(oh_v, dw_vmem[pl.ds(v_blk * BLK, BLK), :],
                          preferred_element_type=jnp.float32,
                          precision=_prec(stream_dtype))   # [E_C, Haug]
            msgs = jnp.dot(oh_u, table_blk_ref[:, :],
                           preferred_element_type=jnp.float32,
                           precision=_prec(stream_dtype))  # [E_C, Haug]
            # expd/slope from the bundled score columns of the two gathers
            # (same dtype+precision as the expd kernel's own score gathers);
            # ss/mx arrive W-wide, so everything below is stream-width.
            ss = msgs[:, ss_base:ss_base + w]
            mx = dwg[:, ss_base:ss_base + w]
            ts = jnp.zeros((E_C, k), jnp.float32)
            for l in range(num_types):
                m_l = (ltype == l).astype(jnp.float32)
                ts = ts + m_l * dwg[:, ts_base + l * k:ts_base + (l + 1) * k]
            p = ss + pltpu.repeat(ts, w // k, axis=1)
            logit = jnp.where(p >= 0, p, LEAKY_SLOPE * p)
            valid = (rel_v[:, None] < BLK) & (rel_u[:, None] < BLK)
            e_c = jnp.where(valid, jnp.exp(logit - mx), 0.0)   # [E_C, W]
            s_c = jnp.where(p >= 0, 1.0, LEAKY_SLOPE)
            # The head-sum contraction follows the stream precision contract
            # (its inputs are already products of stream-rounded values).
            de = jnp.dot((msgs * dwg).astype(stream_dtype), p_ref[:, :],
                         preferred_element_type=jnp.float32,
                         precision=_prec(stream_dtype))    # [E_C, W]
            d_p = e_c * s_c * de
            # Scatter-side products contract the SLOT axis of the same
            # one-hots used for gathering (dim-0 contraction = transposed-lhs
            # matmul) — no second set of one-hot builds.
            ss_contrib = ss_contrib + jax.lax.dot_general(
                oh_u.astype(jnp.float32), d_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=EXACT)
            scaled = (dwg * pltpu.repeat(e_c, rep_tab, axis=1)
                      ).astype(stream_dtype)  # rep pattern: col %% W = head
            tab_contrib = tab_contrib + jax.lax.dot_general(
                oh_u, scaled, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(stream_dtype))
            # d_tgt_scores: accumulate transposed into the resident scratch
            # ([W, L*V] keeps the physical footprint at W sublanes);
            # contracting d_p's slot axis with oh_v scatters onto target
            # columns directly.
            contrib_t = jax.lax.dot_general(
                d_p, oh_v.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=EXACT)                           # [ACC_W, BLK]
            out_blk = ltype * vs_blocks + v_blk
            dts_acc[:, pl.ds(out_blk * BLK, BLK)] = (
                dts_acc[:, pl.ds(out_blk * BLK, BLK)] + contrib_t)

        prev = grp_tgt_ref[jnp.maximum(g - 1, 0)]
        first = jnp.logical_or(g == 0, grp_tgt_ref[g] != prev)

        @pl.when(first)
        def _():
            dss_ref[:, :] = ss_contrib
            dtab_ref[:, :] = tab_contrib

        @pl.when(jnp.logical_not(first))
        def _():
            dss_ref[:, :] = dss_ref[:, :] + ss_contrib
            dtab_ref[:, :] = dtab_ref[:, :] + tab_contrib

        @pl.when(g == num_groups - 1)
        def _():
            dts_ref[:, :] = dts_acc[:, :]

    rows = table.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_groups,),
        in_specs=[
            pl.BlockSpec((group, E_C), lambda g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, E_C), lambda g, *s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, haug), lambda g, s, tb: (tb[g], 0),
                         memory_space=pltpu.VMEM),  # group's source rows
            pl.BlockSpec(memory_space=pltpu.ANY),   # dw_aug stays in HBM
            pl.BlockSpec((haug, w), lambda g, *s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, w), lambda g, s, tb: (tb[g], 0),
                         memory_space=pltpu.VMEM),  # zeros -> d_ss alias
            pl.BlockSpec((BLK, haug), lambda g, s, tb: (tb[g], 0),
                         memory_space=pltpu.VMEM),  # zeros -> d_table alias
        ],
        out_specs=(
            pl.BlockSpec((BLK, w), lambda g, s, tb: (tb[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, haug), lambda g, s, tb: (tb[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ACC_W, rows), lambda g, *s: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((v, haug), stream_dtype),
            pltpu.VMEM((ACC_W, rows), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros_ss = jnp.zeros((rows, w), jnp.float32)
    zeros_tab = jnp.zeros((rows, haug), jnp.float32)
    d_ss_w, d_tab, d_ts_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, w), jnp.float32),
            jax.ShapeDtypeStruct((rows, haug), jnp.float32),
            jax.ShapeDtypeStruct((ACC_W, rows), jnp.float32),
        ),
        input_output_aliases={7: 0, 8: 1},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (3 * BLK * E_C * haug),
            bytes_accessed=(num_chunks // group) * BLK * haug * 2
            + v * haug * 2 + num_chunks * E_C * 8
            + rows * (haug + 2 * w) * 4,
            transcendentals=num_chunks * E_C * k,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), table_aug, dw_aug,
      jnp.asarray(pm, dtype=stream_dtype), zeros_ss, zeros_tab)
    return d_ss_w[:, :k], d_ts_t.T[:, :k], d_tab[:, :orig_h]


def _bwd_fused_jnp(table, d_weighted, d_denom, scores, maxes,
                   rel_src, rel_tgt, src_blk, grp_tgt,
                   num_nodes: int, num_heads: int, src_space: int = None):
    rows = table.shape[0]
    v = num_nodes
    vs = v if src_space is None else src_space
    k = num_heads
    head_dim = table.shape[1] // k
    a_abs, b_abs, valid = _slot_ids_jnp(rel_src, rel_tgt, src_blk, grp_tgt)
    src_rows, tgt_nodes = b_abs, a_abs
    msgs = jnp.take(table, src_rows, axis=0, mode="clip").astype(jnp.float32)
    dwg = jnp.take(d_weighted, tgt_nodes, axis=0,
                   mode="clip").astype(jnp.float32)
    ddg = jnp.take(d_denom, tgt_nodes, axis=0, mode="clip")
    de = (msgs * dwg).reshape(-1, head_dim, k).sum(axis=1) + ddg
    # expd/slope recomputed in backward slot order from scores + maxes
    # (the device kernel reads them off its bundled gathers).
    p, logit, tgt_b, _, _ = _slot_logits_jnp(
        scores, rel_src, rel_tgt, src_blk, grp_tgt, num_nodes, swap=True,
        src_space=src_space)
    mx = jnp.take(maxes, tgt_b, axis=0, mode="clip")
    e_n = jnp.where(valid[:, None], jnp.exp(logit - mx), 0.0)
    slope = jnp.where(p >= 0, 1.0, LEAKY_SLOPE)
    d_p = e_n * slope * de * valid[:, None]
    seg_src = jnp.where(valid, src_rows, rows)
    d_ss = jax.ops.segment_sum(d_p, seg_src, num_segments=rows + 1)[:rows]
    seg_ts = jnp.where(valid, (src_rows // vs) * vs + tgt_nodes, rows)
    d_ts = jax.ops.segment_sum(d_p, seg_ts, num_segments=rows + 1)[:rows]
    scaled = dwg * jnp.tile(e_n * valid[:, None], (1, head_dim))
    d_table = jax.ops.segment_sum(scaled, seg_src,
                                  num_segments=rows + 1)[:rows]
    return d_ss, d_ts, d_table


def pair_attention_bwd_fused(table, d_weighted, d_denom, scores, maxes,
                             rel_src, rel_tgt, src_blk, grp_tgt,
                             num_nodes: int, num_heads: int,
                             interpret=None, src_space: int = None):
    """All three backward-plan gradients in one pass:

        d_src_scores[u, j] = sum over edges (u -> t) of d_p
        d_tgt_scores[l*V + t, j] = sum over type-l edges into t of d_p
        d_table[u, hd*K + j] = sum over edges (u -> t) of expd * dw[t]

    with ``d_p = expd * slope * (head-sum(table[u] * dw[t]) + d_denom[t])``
    and ``expd``/``slope`` recomputed inside the pass from ``scores`` (the
    packed [L*V, 2K] table) and ``maxes`` (the [V, K] stabilisers, already
    rounded to the stream dtype by the caller so forward and backward use
    the same stabiliser). ``d_denom`` is [V, K]; ``d_weighted`` should be
    pre-cast to the stream dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _bwd_fused_jnp if interpret else _bwd_fused_device
    return fn(table, d_weighted, d_denom, scores, maxes,
              rel_src, rel_tgt, src_blk, grp_tgt, num_nodes, num_heads,
              src_space=src_space)

# ---------------------------------------------------------------------------
# The full fused attention primitive.
# ---------------------------------------------------------------------------

def _overflow_logits(scores, ovf_src, ovf_tgt, num_nodes: int,
                     src_space: int = None):
    """(p, logit, valid) of the overflow edges (tiny XLA gathers)."""
    k = scores.shape[1] // 2
    v = num_nodes
    vs = v if src_space is None else src_space
    valid = ovf_tgt < v
    ltype = ovf_src // vs
    ss = jnp.take(scores, ovf_src, axis=0, mode="clip")[:, :k]
    ts_row = ltype * vs + jnp.minimum(ovf_tgt, v - 1)
    ts = jnp.take(scores, ts_row, axis=0, mode="clip")[:, k:]
    p = ss.astype(jnp.float32) + ts.astype(jnp.float32)
    logit = jnp.where(p >= 0, p, LEAKY_SLOPE * p)
    return p, logit, valid


@partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def pair_attention(
    table_hk: jnp.ndarray,      # [L*Vs, H] transformed states, HK-MAJOR heads
    scores: jnp.ndarray,        # [L*Vs, 2K] packed (src | tgt) score halves
    rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,   # forward PairPlan
    rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b,   # backward PairPlan
    ovf_src, ovf_tgt,
    num_nodes: int,
    num_heads: int,
    stabiliser: str = "exact",
    src_space: int = None,
):
    """Fused relational multi-head attention aggregation on pair plans:

        denom[v, k]         = sum over edges e=(u -> v) of expd_e[k]
        weighted[v, hd*K+k] = sum over edges e of expd_e[k] * table[row_e, .]

    with ``expd_e = exp(LeakyReLU(ss[row_e] + ts[l_e*V + v]) - m_v)`` and
    ``m`` the per-(target, head) softmax stabiliser over ALL edge types
    jointly (reference rgat.py:139-151). The caller divides and re-layouts
    heads. Pass plan arrays from ``PairPlans.kernel_arrays``.

    ``stabiliser`` picks how ``m`` is computed (softmax is shift-invariant,
    so the NORMALISED output is identical for any m >= the true max):
    ``"exact"`` runs the max kernel over the edge plans; ``"bound"`` uses
    the node-space upper bound (_bound_stabiliser) and skips that kernel
    pass entirely.
    """
    denom, weighted, _ = _pair_attention_fwd_parts(
        table_hk, scores, rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,
        ovf_src, ovf_tgt, num_nodes, num_heads, stabiliser, src_space,
    )
    return denom, weighted


def _launch_max(scores, fwd_plan, ovf_src, ovf_tgt, v: int, k: int,
                src_space: int = None):
    """Raw per-(target, head) max of ONE launch — kernel slots + its
    overflow edges ([V, K] f32, NEG on empty targets)."""
    m_k = pair_attention_max(scores, *fwd_plan, v, k, src_space=src_space)
    if ovf_src.shape[0] == 0:  # plans with no spilled edges (the common case)
        return m_k
    _, l_o, valid_o = _overflow_logits(scores, ovf_src, ovf_tgt, v,
                                       src_space)
    seg_o = jnp.where(valid_o, ovf_tgt, v)
    m_o = jax.ops.segment_max(
        jnp.where(valid_o[:, None], l_o, NEG), seg_o, num_segments=v + 1
    )[:v]
    return jnp.maximum(m_k, jnp.maximum(m_o, NEG))


def _bound_stabiliser(scores, v: int, k: int, src_space: int = None):
    """[V, K] upper bound on the per-(target, head) max logit, computed in
    NODE SPACE with two tiny dense reduces — no kernel pass over the edge
    plans at all (the exact max kernel costs ~2.5 ms/layer at the PPI bench
    shape, ~30%% of the attention forward):

        m̂[t, j] = leaky(max over types l of (max over sources u of
                         ss[l*V+u, j]) + ts[l*V+t, j])
                 >= max over real in-edges (u -> t) of leaky(ss + ts).

    Softmax is shift-invariant, so the NORMALISED attention output is exact
    under ANY stabiliser >= the true max; only the unnormalised
    (denom, weighted) pair scales by exp(max - m̂). The bound can only be
    loose by (global source max - in-neighbourhood source max) per type;
    denominators underflow f32 only when that looseness exceeds ~87
    log-units — far beyond trained score ranges. expd <= 1 always (no
    overflow). Pad heads (source half 0, target half NEG) produce
    p_bound = LEAKY_SLOPE * NEG — the same huge-negative finite stabiliser
    the exact max yields for them (their garbage output is sliced away by
    the caller, identically under either stabiliser)."""
    vs = v if src_space is None else src_space
    num_types = scores.shape[0] // vs
    ss = scores[:, :k].astype(jnp.float32).reshape(num_types, vs, k)
    ts = scores[:, k:2 * k].astype(jnp.float32).reshape(
        num_types, vs, k)[:, :v]
    smax = jnp.max(ss, axis=1)                        # [L, K]
    p_bound = jnp.max(smax[:, None, :] + ts, axis=0)  # [V, K]
    return jnp.where(p_bound >= 0, p_bound, LEAKY_SLOPE * p_bound)


def _stabilise(m, stream_dtype):
    """Finite softmax stabiliser rounded to the STREAM dtype: the backward
    kernel reads it through its bundled (stream-dtype) cotangent gather, and
    a stabiliser only has to be consistent between forward and backward,
    not exact (shift invariance). Targets with no in-edges keep a finite
    value so exp() stays 0."""
    m_safe = jax.lax.stop_gradient(jnp.where(m > 0.5 * NEG, m, 0.0))
    return m_safe.astype(stream_dtype).astype(jnp.float32)


def _headmajor_sums(table, expd_f, fwd_plan, v: int, k: int):
    """(denom, weighted) via K per-head ``pair_spmm`` launches on a
    HEAD-MAJOR single-tile layout.

    Tile ``kk`` carries ONLY head kk's columns, so its per-slot scale is
    the single expd ROW kk of the transposed stream — foldable into the
    target one-hot exactly
    like pair_spmm's scalar 1/deg scale (A = (oh_tgt * expd_k) @ oh_src,
    two pure-MXU dots per chunk, no f32 message materialisation and no
    per-chunk f32->bf16 pack relayout of scaled messages). A 1.0 written
    into the first padding column makes that output column the softmax
    denominator for the head (row-sums of A) through the same dot.
    Rounding note: A is cast to the table dtype between the two dots
    (pair_spmm kernel), so denominators inherit stream-dtype rounding
    (~0.4% bf16) instead of the wide kernel's EXACT accumulation —
    covered by the drop-in equivalence tolerances."""
    from .pair_spmm import pair_spmm

    rows = table.shape[0]
    head_dim = table.shape[1] // k
    # ONE transpose builds every launch's padded table (k strided
    # [rows, head_dim] column gathers from the hk-major layout would each
    # be their own relayout); ``expd_f`` rows are contiguous per-head
    # scales (transposed stream layout).
    heads_km = table.reshape(rows, head_dim, k).transpose(2, 0, 1)
    t_pads = jnp.concatenate(
        [heads_km,
         jnp.ones((k, rows, 1), table.dtype),
         jnp.zeros((k, rows, TILE - head_dim - 1), table.dtype)],
        axis=2,
    )
    outs = [pair_spmm(t_pads[kk], expd_f[kk], *fwd_plan, v)
            for kk in range(k)]
    denom = jnp.stack([o[:, head_dim] for o in outs], axis=-1)
    weighted = jnp.stack([o[:, :head_dim] for o in outs],
                         axis=-1).reshape(v, head_dim * k)
    return denom, weighted


def _launch_sums(table, scores, m_safe, fwd_plan, ovf_src, ovf_tgt,
                 v: int, k: int, src_space: int = None):
    """(denom, weighted, expd_o, slope_o) of one launch under a GIVEN
    stabiliser (which may span several launches — the per-type form).

    The forward streams a dedicated [slots, W] f32 expd array between the
    expd kernel and the aggregation sweep: recomputing expd in-register per
    feature-tile sweep was measured 2.75x SLOWER (13.5 vs 2.0+2.9 ms/layer
    at the PPI bench shape) — the per-chunk narrow score-gather dots repeat
    h_tiles times and cost far more than the compact stream's HBM round
    trip (~46 MB/layer at ~740 GB/s). The fused BACKWARD kernel keeps the
    in-register recompute: it pays the gathers exactly once."""
    head_dim = table.shape[1] // k
    expd_f, _ = pair_attention_expd(scores, m_safe, *fwd_plan, v, k,
                                    with_slope=False, src_space=src_space)
    # Measured cost model (TPU v5e, PPI bench shape, 2026-08-19): one
    # head-major pair_spmm launch sweeps the chunk plan once (~0.32
    # ms/launch at 2800 chunks) while one agg-kernel feature tile costs
    # ~1.87 ms/sweep (f32 message materialisation + per-chunk pack
    # relayout + denominator work) — a ~6x per-sweep ratio. Route to
    # head-major when its k sweeps beat the agg kernel's h_tiles sweeps
    # with a conservative factor-4 margin (K=4: 4.4x measured win, K=8:
    # 2.3x; K > 4*h_tiles keeps the single-kernel hk-major sweep).
    h_tiles = max(-(-table.shape[1] // TILE), 1)
    if head_dim + 1 <= TILE and k <= 4 * h_tiles:
        denom, weighted = _headmajor_sums(table, expd_f, fwd_plan, v, k)
    else:
        # The agg kernel consumes the legacy [slots, W] stream layout.
        denom, weighted = pair_attention_agg(
            table, expd_f.T, *fwd_plan, v, k,
        )
    if ovf_src.shape[0] == 0:  # no spilled edges (the common case)
        zero_o = jnp.zeros((0, k), jnp.float32)
        return denom, weighted, zero_o, zero_o
    p_o, l_o, valid_o = _overflow_logits(scores, ovf_src, ovf_tgt, v,
                                         src_space)
    seg_o = jnp.where(valid_o, ovf_tgt, v)
    expd_o = jnp.where(
        valid_o[:, None],
        jnp.exp(l_o - jnp.take(m_safe, jnp.minimum(ovf_tgt, v - 1),
                               axis=0, mode="clip")),
        0.0,
    )
    slope_o = jnp.where(p_o >= 0, 1.0, LEAKY_SLOPE)
    msgs_o = jnp.take(table, ovf_src, axis=0,
                      mode="clip").astype(jnp.float32)
    denom = denom + jax.ops.segment_sum(
        expd_o, seg_o, num_segments=v + 1)[:v]
    weighted = weighted + jax.ops.segment_sum(
        msgs_o * jnp.tile(expd_o, (1, head_dim)), seg_o,
        num_segments=v + 1)[:v]
    return denom, weighted, expd_o, slope_o


def _launch_bwd(table, scores, m_safe, d_denom, d_weighted, dw_stream,
                bwd_plan, ovf_src, ovf_tgt, expd_o, slope_o, v: int, k: int,
                src_space: int = None):
    """(d_src_scores, d_tgt_scores, d_table) of one launch — the fused
    backward kernel plus its overflow terms."""
    rows = table.shape[0]
    head_dim = table.shape[1] // k
    d_ss, d_ts, d_table = pair_attention_bwd_fused(
        table, dw_stream, d_denom, scores, m_safe, *bwd_plan, v, k,
        src_space=src_space,
    )
    if ovf_src.shape[0] == 0:  # no spilled edges (the common case)
        return d_ss, d_ts, d_table
    valid_o = ovf_tgt < v
    tgt_o = jnp.minimum(ovf_tgt, v - 1)
    dwg_o = jnp.take(d_weighted, tgt_o, axis=0) * valid_o[:, None]
    ddg_o = jnp.take(d_denom, tgt_o, axis=0) * valid_o[:, None]
    msgs_o = jnp.take(table, ovf_src, axis=0,
                      mode="clip").astype(jnp.float32)
    de_o = ((msgs_o * dwg_o).reshape(-1, head_dim, k).sum(axis=1) + ddg_o)
    d_p_o = expd_o * slope_o * de_o
    d_table = d_table + jax.ops.segment_sum(
        dwg_o * jnp.tile(expd_o, (1, head_dim)), ovf_src,
        num_segments=rows)
    d_ss = d_ss + jax.ops.segment_sum(d_p_o, ovf_src, num_segments=rows)
    vs = v if src_space is None else src_space
    ltype_o = ovf_src // vs
    d_ts = d_ts + jax.ops.segment_sum(
        d_p_o, jnp.where(valid_o, ltype_o * vs + tgt_o, rows),
        num_segments=rows + 1)[:rows]
    return d_ss, d_ts, d_table


def _pair_attention_fwd_parts(table_hk, scores, rel_src_f, rel_tgt_f,
                              src_blk_f, grp_tgt_f, ovf_src, ovf_tgt,
                              num_nodes: int, num_heads: int,
                              stabiliser: str = "exact",
                              src_space: int = None):
    v = num_nodes
    k = num_heads
    fwd_plan = (rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f)
    if stabiliser == "bound":
        m = _bound_stabiliser(scores, v, k, src_space)
    else:
        m = _launch_max(scores, fwd_plan, ovf_src, ovf_tgt, v, k, src_space)
    m_safe = _stabilise(m, table_hk.dtype)
    denom, weighted, expd_o, slope_o = _launch_sums(
        table_hk, scores, m_safe, fwd_plan, ovf_src, ovf_tgt, v, k,
        src_space)
    return denom, weighted, (m_safe, expd_o, slope_o)


def _pa_fwd(table_hk, scores, rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,
            rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, ovf_src, ovf_tgt,
            num_nodes, num_heads, stabiliser, src_space):
    denom, weighted, saved = _pair_attention_fwd_parts(
        table_hk, scores, rel_src_f, rel_tgt_f, src_blk_f, grp_tgt_f,
        ovf_src, ovf_tgt, num_nodes, num_heads, stabiliser, src_space,
    )
    m_safe, expd_o, slope_o = saved
    res = (table_hk, scores, m_safe, expd_o, slope_o,
           rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, ovf_src, ovf_tgt)
    return (denom, weighted), res


def _pa_bwd(num_nodes, num_heads, stabiliser, src_space, res, g):
    (table_hk, scores, m_safe, expd_o, slope_o,
     rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b, ovf_src, ovf_tgt) = res
    d_denom, d_weighted = g
    d_denom = d_denom.astype(jnp.float32)
    d_weighted = d_weighted.astype(jnp.float32)
    # Cotangents stream at the table dtype through the wide kernels (bf16 in
    # the shipped config — same contract as the forward message stream).
    dw_stream = d_weighted.astype(table_hk.dtype)
    d_ss, d_ts, d_table = _launch_bwd(
        table_hk, scores, m_safe, d_denom, d_weighted, dw_stream,
        (rel_src_b, rel_tgt_b, src_blk_b, grp_tgt_b), ovf_src, ovf_tgt,
        expd_o, slope_o, num_nodes, num_heads, src_space,
    )
    d_scores = jnp.concatenate([d_ss, d_ts], axis=1).astype(scores.dtype)
    return (d_table.astype(table_hk.dtype), d_scores) + (None,) * 10


pair_attention.defvjp(_pa_fwd, _pa_bwd)


# ---------------------------------------------------------------------------
# The per-type (row-split) attention primitive: one launch per edge type
# over the [V] single-type row space, with the softmax max/denominator still
# spanning ALL types jointly (the stabiliser is the elementwise max of the
# per-type maxes — reference rgat.py:139-151's joint segment softmax).
# For graphs whose merged [L*V] tables exceed the kernels' VMEM residency.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pair_attention_typed(
    table_hk: jnp.ndarray,      # [L*V, H] transformed states, HK-MAJOR heads
    scores: jnp.ndarray,        # [L*V, 2K] packed score halves
    plans_typed,                # tuple of per-type PairPlans.astuple()
    num_nodes: int,
    num_heads: int,
    stabiliser: str = "exact",
):
    """``pair_attention`` semantics over PER-TYPE plans (row-split form)."""
    denom, weighted, _ = _pat_fwd_parts(
        table_hk, scores, plans_typed, num_nodes, num_heads, stabiliser)
    return denom, weighted


def _pat_fwd_parts(table_hk, scores, plans_typed, v, k,
                   stabiliser: str = "exact"):
    num_types = len(plans_typed)
    tables = table_hk.reshape(num_types, v, -1)
    sc = scores.reshape(num_types, v, -1)
    if stabiliser == "bound":
        # The bound already spans all types jointly — one dense reduce over
        # the stacked [L*V, 2K] scores, no per-launch max kernels at all.
        m = _bound_stabiliser(scores, v, k)
    else:
        m = jnp.full((v, k), NEG, jnp.float32)
        for l, plans in enumerate(plans_typed):
            m = jnp.maximum(
                m, _launch_max(sc[l], plans[:4], plans[8], plans[9], v, k))
    m_safe = _stabilise(m, table_hk.dtype)
    denom = jnp.zeros((v, k), jnp.float32)
    weighted = jnp.zeros((v, table_hk.shape[1]), jnp.float32)
    saved_o = []
    for l, plans in enumerate(plans_typed):
        d, w, eo, so = _launch_sums(
            tables[l], sc[l], m_safe, plans[:4], plans[8], plans[9], v, k)
        denom = denom + d
        weighted = weighted + w
        saved_o.append((eo, so))
    return denom, weighted, (m_safe, tuple(saved_o))


def _pat_fwd(table_hk, scores, plans_typed, num_nodes, num_heads, stabiliser):
    denom, weighted, saved = _pat_fwd_parts(
        table_hk, scores, plans_typed, num_nodes, num_heads, stabiliser)
    m_safe, saved_o = saved
    return (denom, weighted), (table_hk, scores, plans_typed, m_safe, saved_o)


def _pat_bwd(num_nodes, num_heads, stabiliser, res, g):
    table_hk, scores, plans_typed, m_safe, saved_o = res
    d_denom, d_weighted = g
    d_denom = d_denom.astype(jnp.float32)
    d_weighted = d_weighted.astype(jnp.float32)
    dw_stream = d_weighted.astype(table_hk.dtype)
    v = num_nodes
    num_types = len(plans_typed)
    tables = table_hk.reshape(num_types, v, -1)
    sc = scores.reshape(num_types, v, -1)
    d_tables, d_scores = [], []
    for l, plans in enumerate(plans_typed):
        eo, so = saved_o[l]
        d_ss, d_ts, d_tab = _launch_bwd(
            tables[l], sc[l], m_safe, d_denom, d_weighted, dw_stream,
            plans[4:8], plans[8], plans[9], eo, so, v, num_heads,
        )
        d_tables.append(d_tab)
        d_scores.append(jnp.concatenate([d_ss, d_ts], axis=1))
    d_table = jnp.concatenate(d_tables, axis=0).astype(table_hk.dtype)
    d_sc = jnp.concatenate(d_scores, axis=0).astype(scores.dtype)
    return d_table, d_sc, None


pair_attention_typed.defvjp(_pat_fwd, _pat_bwd)
