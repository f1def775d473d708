"""Sparse-pair packing for RGAT: measure the round-4 estimate (VERDICT r4
item 6).

Round 4's chunk decomposition left one unexplored lever for the RGAT step:
~315 of the bench workload's block pairs carry <= 64 edges, and packing two
such pairs into one kernel chunk would cut chunk count at the price of a
second gather dot in every packed chunk. This probe converts that estimate
into MEASURED planner numbers on the real bench plans:

* packs the actual (tgt_block, src_block) pair list two-per-chunk wherever
  two pairs share a target block and fit one chunk's slots together,
  re-applying the SAME run/group alignment the shipped planner uses;
* accounts the MXU pass delta: a packed chunk splits its slot range in two
  half-width gather dots (same total passes as one full-width build) but
  needs a SECOND [BLK,BLK] @ [BLK,TILE] table dot per feature tile per
  sweep — +1 pass per h-tile-sweep per packed chunk;
* projects the net step change from the measured per-chunk rate
  (PERFORMANCE.md round 4: 86-110 ns/chunk-sweep across the kernel family).

Run: python benchmarks/pack_probe.py   (host-only; no TPU required)
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import NODE_BUDGET, build_raw_arrays  # noqa: E402
from tf2_gnn_tpu.ops.pair_spmm import BLK, E_C  # noqa: E402


def pair_stats(src, tgt):
    sb, tb = src // BLK, tgt // BLK
    order = np.lexsort((sb, tb))
    s_sb, s_tb = sb[order], tb[order]
    key = s_tb.astype(np.int64) * (s_sb.max() + 2) + s_sb
    change = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [key.shape[0]])))
    return s_tb[starts], s_sb[starts], counts


def chunks_with_alignment(pair_tb, pair_chunks, group):
    """Total chunks after per-target-run group alignment (the planner's
    grouping() logic)."""
    run_change = np.flatnonzero(np.diff(pair_tb)) + 1
    run_starts = np.concatenate(([0], run_change))
    run_ends = np.concatenate((run_change, [pair_tb.shape[0]]))
    csum = np.concatenate(([0], np.cumsum(pair_chunks)))
    run_sizes = csum[run_ends] - csum[run_starts]
    run_padded = ((run_sizes + group - 1) // group) * group
    return int(run_padded.sum())


def pack_two_per_chunk(pair_tb, counts):
    """Greedy: within each target-block run, merge pairs pairwise while the
    two fit one chunk's E_C slots and each needs only one chunk alone.
    Returns the packed per-'chunk unit' (tb, chunks) arrays + pack count."""
    out_tb, out_chunks = [], []
    packed_pairs = 0
    for tb in np.unique(pair_tb):
        sizes = counts[pair_tb == tb]
        singles = sorted(int(s) for s in sizes if s <= E_C)
        multis = [int(s) for s in sizes if s > E_C]
        # Greedy smallest+largest pairing among single-chunk pairs.
        i, j = 0, len(singles) - 1
        while i < j:
            if singles[i] + singles[j] <= E_C:
                packed_pairs += 2
                out_tb.append(tb)
                out_chunks.append(1)
                i += 1
                j -= 1
            else:
                out_tb.append(tb)
                out_chunks.append(1)
                j -= 1
        if i == j:
            out_tb.append(tb)
            out_chunks.append(1)
        for s in multis:
            out_tb.append(tb)
            out_chunks.append((s + E_C - 1) // E_C)
    return np.asarray(out_tb), np.asarray(out_chunks), packed_pairs


def direction(name, src, tgt, group, h_tiles, sweeps):
    pair_tb, pair_sb, counts = pair_stats(src, tgt)
    pair_chunks = (counts + E_C - 1) // E_C
    base = chunks_with_alignment(pair_tb, pair_chunks, group)

    ptb, pch, packed_pairs = pack_two_per_chunk(pair_tb, counts)
    packed = chunks_with_alignment(ptb, pch, group)
    packed_chunks = packed_pairs // 2

    # Pass accounting per chunk per h-tile sweep: full-width gather/A build
    # = E_C/128 passes (unchanged when split into two half-width dots) +
    # one table dot; a packed chunk pays a SECOND table dot.
    passes_per_chunk = sweeps * h_tiles * (E_C // 128 + 1)
    extra_per_packed = sweeps * h_tiles  # +1 table dot per h-tile sweep
    base_passes = base * passes_per_chunk
    packed_passes = packed * passes_per_chunk + packed_chunks * extra_per_packed

    print(f"{name}: pairs={len(counts)} (<= {E_C // 2} edges: "
          f"{int((counts <= E_C // 2).sum())}, packable fit: {packed_pairs})")
    print(f"  chunks {base} -> {packed}  ({100 * (base - packed) / base:.1f}% "
          f"saved; {packed_chunks} packed chunks)")
    print(f"  MXU passes {base_passes} -> {packed_passes}  "
          f"(net {100 * (packed_passes - base_passes) / base_passes:+.1f}%)")
    return base, packed, base_passes, packed_passes


def main():
    _, (loops, fwd, bkwd), _ = build_raw_arrays(0)
    all_src = np.concatenate([a[:, 0] for a in (loops, fwd, bkwd)])
    all_tgt = np.concatenate([a[:, 1] for a in (loops, fwd, bkwd)])
    # Merged-source row space l*V+u, as build_pair_plans lays the fwd plan.
    offs = np.concatenate([np.full(a.shape[0], i * NODE_BUDGET)
                           for i, a in enumerate((loops, fwd, bkwd))])
    src_m = all_src + offs

    # Shipped RGAT groups (16 fwd, 8 bwd); h_tiles = ceil(320/128) = 3.
    # Sweeps touching chunk plans: fwd expd+agg streams ~2 table-dot sweeps,
    # fused backward ~3 (PERFORMANCE round 2c/4 pass decompositions).
    # fwd: output rows = raw targets [V], gathered rows = merged sources.
    # bwd: output rows = MERGED sources [L*V], gathered rows = raw targets.
    fb = direction("fwd (agg/expd sweeps)", src_m, all_tgt, 16, 3, 2)
    bb = direction("bwd (fused 3-gradient)", all_tgt, src_m, 8, 3, 3)

    total_base = fb[2] + bb[2]
    total_packed = fb[3] + bb[3]
    net = 100 * (total_packed - total_base) / total_base
    # Measured chunk-sweep rate: 86-110 ns (PERFORMANCE round 4); RGAT
    # attention fwd+bwd 2.51 ms/layer at 2800+3256 chunks.
    step_ms = 23.7
    attn_ms_per_layer = 2.51
    proj = attn_ms_per_layer * 4 * net / 100
    print(f"\nnet MXU-pass change: {net:+.2f}% of the attention kernels"
          f" -> projected step {step_ms:.1f} -> {step_ms + proj:.1f} ms "
          f"({-100 * proj / step_ms:+.1f}% step)")


if __name__ == "__main__":
    main()
