"""Probe: block-pair fused gather+scatter SpMM kernel (design validation).

The XLA row gather feeding the scatter kernel is row-rate limited
(kernel_micro: 36 GB/s bf16 / 95 GB/s f32); this probes the replacement:
sort edges by (target-block, source-block) pair, pad each pair's edges to
chunks of 128 slots, and per chunk compute

    out[tgt_block] += (oh_tgt*scale @ oh_src) @ table[src_block]

entirely on the MXU, with the full node-table feature tile RESIDENT in VMEM
(one DMA per feature-tile pass), so the only HBM traffic is table + plans +
output. Usage: python benchmarks/pair_probe.py [variant...]
"""
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batch  # noqa: E402

E_C = 128     # edge slots per chunk (one pair per chunk, padded)
BLK = 128     # node rows per block
TILE = 128    # feature tile; H is padded 320 -> 384 (3 tiles)
H_PAD = 384


def plan_block_pairs(src, tgt, num_rows, num_nodes):
    """Sort edges by (tgt_block, src_block); pad each pair to E_C chunks.

    Returns (rel_src[C,E_C], rel_tgt[C,E_C], scale[C,E_C], src_blk[C],
    tgt_blk[C]) with sentinel rel == BLK (one-hot misses) on padding.
    """
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    sb, tb = src // BLK, tgt // BLK
    order = np.lexsort((src, sb, tb))
    src, tgt, sb, tb = src[order], tgt[order], sb[order], tb[order]
    pair = tb * (num_rows // BLK) + sb
    # Pair boundaries + per-pair counts (vectorized).
    change = np.flatnonzero(np.diff(pair)) + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [pair.shape[0]])))
    chunks_per_pair = np.maximum((counts + E_C - 1) // E_C, 1)
    chunk_of_pair_start = np.concatenate(([0], np.cumsum(chunks_per_pair)))
    num_chunks = int(chunk_of_pair_start[-1])
    num_chunks_pad = ((num_chunks + 7) // 8) * 8

    # Slot index per edge: pair chunk base + offset within pair.
    offs = np.arange(pair.shape[0]) - np.repeat(starts, counts)
    slot = np.repeat(chunk_of_pair_start[:-1], counts) * E_C + offs

    rel_src = np.full((num_chunks_pad * E_C,), BLK, np.int32)
    rel_tgt = np.full((num_chunks_pad * E_C,), BLK, np.int32)
    scale = np.zeros((num_chunks_pad * E_C,), np.float32)
    rel_src[slot] = src - sb * BLK
    rel_tgt[slot] = tgt - tb * BLK
    scale[slot] = 1.0

    src_blk = np.zeros((num_chunks_pad,), np.int32)
    tgt_blk = np.zeros((num_chunks_pad,), np.int32)
    chunk_pair = np.repeat(np.arange(starts.shape[0]), chunks_per_pair)
    src_blk[:num_chunks] = sb[starts][chunk_pair]
    tgt_blk[:num_chunks] = tb[starts][chunk_pair]
    if num_chunks:
        # Keep tgt_blk non-decreasing through padding (revisit detection).
        tgt_blk[num_chunks:] = tgt_blk[num_chunks - 1]
        src_blk[num_chunks:] = src_blk[num_chunks - 1]
    return (rel_src.reshape(num_chunks_pad, E_C),
            rel_tgt.reshape(num_chunks_pad, E_C),
            scale.reshape(num_chunks_pad, E_C), src_blk, tgt_blk)


def regroup_for_unroll(rel_src, rel_tgt, scale, src_blk, tgt_blk, group=8):
    """Pad the chunk stream so groups of ``group`` chunks never span a
    tgt-block boundary; returns arrays with num_chunks a multiple of group
    plus the per-group tgt block ids."""
    n = rel_src.shape[0]
    runs = []  # (start, end) of equal-tgt_blk runs
    s = 0
    for i in range(1, n + 1):
        if i == n or tgt_blk[i] != tgt_blk[s]:
            runs.append((s, i))
            s = i
    out_rs, out_rt, out_sc, out_sb, out_tb = [], [], [], [], []
    for s, e in runs:
        cnt = e - s
        pad = (-cnt) % group
        out_rs.append(rel_src[s:e])
        out_rt.append(rel_tgt[s:e])
        out_sc.append(scale[s:e])
        out_sb.append(src_blk[s:e])
        out_tb.append(tgt_blk[s:e])
        if pad:
            out_rs.append(np.full((pad, E_C), BLK, np.int32))
            out_rt.append(np.full((pad, E_C), BLK, np.int32))
            out_sc.append(np.zeros((pad, E_C), np.float32))
            out_sb.append(np.zeros((pad,), np.int32))
            out_tb.append(np.full((pad,), tgt_blk[s], np.int32))
    rel_src = np.concatenate(out_rs)
    rel_tgt = np.concatenate(out_rt)
    scale = np.concatenate(out_sc)
    src_blk = np.concatenate(out_sb)
    tgt_blk = np.concatenate(out_tb)
    grp_tgt = tgt_blk[::group].copy()
    return rel_src, rel_tgt, scale, src_blk, tgt_blk, grp_tgt


def pair_spmm_unrolled(table, rel_src, rel_tgt, scale, src_blk, grp_tgt,
                       num_nodes, group=8):
    """Like pair_spmm but one grid step processes ``group`` chunks that all
    share one tgt block, amortising per-step overhead."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, h = table.shape
    num_chunks = rel_src.shape[0]
    num_groups = num_chunks // group
    h_tiles = h // TILE

    def kernel(src_blk_ref, grp_tgt_ref, rel_s_ref, rel_t_ref, scale_ref,
               table_hbm, zeros_ref, out_ref, table_vmem, copy_sem):
        del zeros_ref
        t = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            dma = pltpu.make_async_copy(
                table_hbm.at[:, pl.ds(t * TILE, TILE)], table_vmem, copy_sem
            )
            dma.start()
            dma.wait()

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        contrib = jnp.zeros((BLK, TILE), jnp.float32)
        for k in range(group):
            rel_t = rel_t_ref[k, :]
            rel_s = rel_s_ref[k, :]
            sc = scale_ref[k, :]
            oh_t = ((rows_i == rel_t[None, :]).astype(jnp.float32)
                    * sc[None, :]).astype(jnp.bfloat16)
            oh_s = (cols_i == rel_s[:, None]).astype(jnp.bfloat16)
            a = jnp.dot(oh_t, oh_s, preferred_element_type=jnp.float32)
            blk = src_blk_ref[g * group + k]
            tb = table_vmem[pl.ds(blk * BLK, BLK), :]
            contrib = contrib + jnp.dot(a.astype(jnp.bfloat16), tb,
                                        preferred_element_type=jnp.float32)

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
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, TILE), lambda t, g, s, tb: (tb[g], t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, TILE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((num_nodes, h), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), jnp.float32),
        input_output_aliases={6: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (BLK * E_C * BLK + BLK * BLK * TILE)
            * h_tiles,
            bytes_accessed=rows * h * 2 + num_chunks * E_C * 12
            + num_nodes * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(grp_tgt), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), jnp.asarray(scale), table, zeros)


def pair_spmm(table, rel_src, rel_tgt, scale, src_blk, tgt_blk, num_nodes):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, h = table.shape
    num_chunks = rel_src.shape[0]
    h_tiles = h // TILE

    def kernel(src_blk_ref, tgt_blk_ref, rel_s_ref, rel_t_ref, scale_ref,
               table_hbm, zeros_ref, out_ref, table_vmem, copy_sem):
        del zeros_ref
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            dma = pltpu.make_async_copy(
                table_hbm.at[:, pl.ds(t * TILE, TILE)], table_vmem, copy_sem
            )
            dma.start()
            dma.wait()

        rel_t = rel_t_ref[c % 8, :]
        rel_s = rel_s_ref[c % 8, :]
        sc = scale_ref[c % 8, :]
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLK, E_C), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (E_C, BLK), 1)
        oh_t = ((rows_i == rel_t[None, :]).astype(jnp.float32)
                * sc[None, :]).astype(jnp.bfloat16)
        oh_s = (cols_i == rel_s[:, None]).astype(jnp.bfloat16)
        a = jnp.dot(oh_t, oh_s, preferred_element_type=jnp.float32)
        blk = src_blk_ref[c]
        tb = table_vmem[pl.ds(blk * BLK, BLK), :]
        contrib = jnp.dot(a.astype(jnp.bfloat16), tb,
                          preferred_element_type=jnp.float32)

        prev = tgt_blk_ref[jnp.maximum(c - 1, 0)]
        first = jnp.logical_or(c == 0, tgt_blk_ref[c] != prev)

        @pl.when(first)
        def _():
            out_ref[:, :] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, :] = out_ref[:, :] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # src_blk, tgt_blk
        grid=(h_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((8, E_C), lambda t, c, *s: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, E_C), lambda t, c, *s: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, E_C), lambda t, c, *s: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),       # table stays in HBM
            pl.BlockSpec((BLK, TILE), lambda t, c, s, tb: (tb[c], t),
                         memory_space=pltpu.VMEM),      # zeros -> out alias
        ],
        out_specs=pl.BlockSpec((BLK, TILE), lambda t, c, s, tb: (tb[c], t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, TILE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((num_nodes, h), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, h), jnp.float32),
        input_output_aliases={6: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (BLK * E_C * BLK + BLK * BLK * TILE)
            * h_tiles,
            bytes_accessed=rows * h * 2 + num_chunks * E_C * 12
            + num_nodes * h * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(src_blk), jnp.asarray(tgt_blk), jnp.asarray(rel_src),
      jnp.asarray(rel_tgt), jnp.asarray(scale), table, zeros)


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.kernel_micro import timed

    batch, labels, edges = build_batch(0)
    v = batch.num_nodes_padded
    ltypes = len(batch.edge_sources)
    rows = ltypes * v
    rng = np.random.RandomState(0)

    # Rebuild the raw typed edge lists (global src row = l*V + u).
    srcs = np.concatenate([
        np.asarray(batch.edge_sources[l]) + l * v for l in range(ltypes)
    ])
    tgts = np.concatenate([np.asarray(t) for t in batch.edge_targets])
    real = np.concatenate([
        np.arange(len(batch.edge_sources[l])) < int(batch.num_edges[l])
        for l in range(ltypes)
    ])
    srcs, tgts = srcs[real], tgts[real]

    t0 = time.time()
    rel_src, rel_tgt, scale, src_blk, tgt_blk = plan_block_pairs(
        srcs, tgts, rows, v
    )
    t_plan = time.time() - t0
    num_chunks = rel_src.shape[0]
    print(f"# V={v} rows={rows} E={srcs.shape[0]} chunks={num_chunks} "
          f"slots={num_chunks*E_C} inflation="
          f"{num_chunks*E_C/max(srcs.shape[0],1):.2f}x plan={t_plan*1e3:.0f}ms",
          flush=True)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows, H_PAD), jnp.float32).astype(jnp.bfloat16)

    ref = np.zeros((v, H_PAD), np.float32)
    np.add.at(ref, tgts, np.asarray(table, np.float32)[srcs])

    import benchmarks.kernel_micro as km

    def with_force(body):
        def wrapped(o):
            outv = body(o)
            return outv, jnp.sum(outv[0, :8].astype(jnp.float32))
        return jax.jit(wrapped)

    which = sys.argv[1:] or ["base", "unroll8"]

    if "base" in which:
        out = np.asarray(pair_spmm(table, rel_src, rel_tgt, scale, src_blk,
                                   tgt_blk, v))
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"# base rel-max error vs numpy: {err:.2e}", flush=True)

        def chain(o):
            tb = (table + o[0, :1].astype(jnp.bfloat16) * 0)
            return pair_spmm(tb, rel_src, rel_tgt, scale, src_blk, tgt_blk, v)

        dt = km.timed(with_force(chain), jnp.zeros((v, H_PAD), jnp.float32))
        print(f"pair_spmm {dt*1e3:8.3f} ms | "
              f"{srcs.shape[0]/dt/1e6:.1f}M edges/s-pass"
              f" | vs fused_take_scatter 3.96 ms", flush=True)

    for name in which:
        if not name.startswith("unroll"):
            continue
        group = int(name[len("unroll"):])
        rs, rt, sc, sb, tb_, gt = regroup_for_unroll(
            rel_src, rel_tgt, scale, src_blk, tgt_blk, group=group
        )
        print(f"# {name}: chunks {rel_src.shape[0]} -> {rs.shape[0]} "
              f"({rs.shape[0]*E_C/srcs.shape[0]:.2f}x slots)", flush=True)
        out = np.asarray(pair_spmm_unrolled(table, rs, rt, sc, sb, gt, v,
                                            group=group))
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"# {name} rel-max error vs numpy: {err:.2e}", flush=True)

        def chain_u(o, rs=rs, rt=rt, sc=sc, sb=sb, gt=gt, group=group):
            tbl = (table + o[0, :1].astype(jnp.bfloat16) * 0)
            return pair_spmm_unrolled(tbl, rs, rt, sc, sb, gt, v, group=group)

        dt = km.timed(with_force(chain_u), jnp.zeros((v, H_PAD), jnp.float32))
        print(f"pair_spmm_{name} {dt*1e3:8.3f} ms | "
              f"{srcs.shape[0]/dt/1e6:.1f}M edges/s-pass", flush=True)


if __name__ == "__main__":
    main()
