"""Analytic ICI scaling model for SPMD node-partitioned training.

Multi-chip hardware is not reachable from this environment, so the >= 80%
scaling-efficiency target (BASELINE.md) is supported by an ANALYTIC model
fed with MEASURED inputs rather than a measured multi-chip run:

* the exchanged-byte counts are REAL — ``partition_graph(halo=True)`` is
  run at each shard count and the planned ``max_send`` (the padded
  per-(owner, consumer) boundary row count) is read off the plan;
* per-edge compute time comes from the measured single-chip step
  (PERFORMANCE.md headline), scaled by the local edge share;
* ICI time assumes each shard sends/receives its halo rows once per MP
  layer (forward) and once transposed (backward) at ``--ici-gbps`` per
  direction (default 45 GB/s, a v5e ICI link);
* each row carries TWO efficiencies: ``projected_efficiency`` serialises
  the exchange fully against compute (the lower bound), and
  ``projected_efficiency_overlap`` credits the overlap the implementation
  actually performs — the collective's input is the RAW node states, so
  XLA schedules it concurrently with the independent node-space transform
  (``gnn_edge_mlp.py::_fused_node_space_tables``); the credit hides up to
  ``--overlap-window-ms`` of exchange per layer (default 0.12 ms — the
  MEASURED single-chip forward transform matmul from the round-4
  layer bisection, itself a lower bound on the true window since the
  backward's larger dW/dX matmuls overlap the transposed exchange too).

Prints one JSON line per (graph kind, shard count).

Usage: python benchmarks/scaling_model.py [--step-ms 8.8] [--ici-gbps 45]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # noqa: E402


def bench_shaped_graph(rng, scale=1):
    """The headline workload: PPI-shaped graphs, random intra-graph
    connectivity (a pessimistic partitioning case — no locality).
    ``scale`` multiplies the graph count (weak scaling)."""
    num_graphs = bench.GRAPHS_PER_BATCH * scale
    v = num_graphs * bench.NODES_PER_GRAPH
    adjacency = []
    fwd, bkwd, loops = [], [], []
    for g in range(num_graphs):
        base = g * bench.NODES_PER_GRAPH
        src = rng.randint(0, bench.NODES_PER_GRAPH,
                          bench.FWD_EDGES_PER_GRAPH) + base
        tgt = rng.randint(0, bench.NODES_PER_GRAPH,
                          bench.FWD_EDGES_PER_GRAPH) + base
        fwd.append(np.stack([src, tgt], 1))
        bkwd.append(np.stack([tgt, src], 1))
        nodes = np.arange(base, base + bench.NODES_PER_GRAPH)
        loops.append(np.stack([nodes, nodes], 1))
    adjacency = [np.concatenate(loops), np.concatenate(fwd),
                 np.concatenate(bkwd)]
    return v, [a.astype(np.int32) for a in adjacency]


def clustered_graph(rng, scale=1, v=7200, avg_deg=29, spread=192):
    """Locality-friendly twin: same size/degree, but edges connect nearby
    node ids (graph communities laid out contiguously — what a METIS-style
    reorder produces)."""
    v = v * scale
    e = v * avg_deg
    src = rng.randint(0, v, e)
    tgt = np.clip(src + rng.randint(-spread, spread + 1, e), 0, v - 1)
    nodes = np.arange(v)
    adjacency = [np.stack([nodes, nodes], 1).astype(np.int32),
                 np.stack([src, tgt], 1).astype(np.int32),
                 np.stack([tgt, src], 1).astype(np.int32)]
    return v, adjacency


def shuffled_clustered_graph(rng, scale=1):
    """The clustered graph with its node ids SHUFFLED: latent locality the
    contiguous-range partitioner cannot see. This is the case the RCM
    reordering pass (parallel/reorder.py) exists for — real giant graphs
    (meshes, molecules, road/social networks) have community structure but
    arrive hash- or insertion-ordered. (A TRUE Erdos-Renyi graph has no
    locality for ANY partitioner, METIS included; its boundary genuinely
    is ~V.)"""
    v, adjacency = clustered_graph(rng, scale)
    shuf = rng.permutation(v).astype(np.int32)
    return v, [shuf[a] for a in adjacency]


def model_one(kind, v, adjacency, s, compute_s, args, reorder=False):
    from tf2_gnn_tpu.parallel.spmd import partition_graph

    nf = np.zeros((v, 8), np.float32)
    n2g = np.zeros((v,), np.int32)
    # The integrated reorder path: partition_graph applies the RCM pass
    # itself (True forces it; False pins the given labelling so the
    # no-reorder rows stay comparable).
    batch, _ = partition_graph(
        nf, adjacency, n2g, num_graphs=1, num_shards=s, reorder=reorder)
    if batch.halo_ring_send is not None:
        form = "ring"
        rows_moved = sum(idx.shape[1] for idx in batch.halo_ring_send)
    else:
        form = "dense"
        rows_moved = s * int(batch.halo_send_idx.shape[-1])
    # Bytes one shard moves per MP layer (fwd states out + in; the
    # gradient transpose moves the same rows back in the backward).
    send_bytes = rows_moved * args.hidden * args.itemsize
    layer_exchange_s = 2 * send_bytes / (args.ici_gbps * 1e9)
    # Optimizer psum per STEP, amortised per layer.
    psum_s = 2 * args.param_bytes / (args.ici_gbps * 1e9) / args.layers
    eff = compute_s / (compute_s + layer_exchange_s + psum_s)
    # Overlap credit: the per-shard transform window scales with the
    # per-shard work exactly as compute_s does (compute_s already carries
    # the 1/s strong-scaling factor or the constant weak-scaling share).
    window_s = (args.overlap_window_ms / 1e3) * (
        compute_s / ((args.step_ms / 1e3) / args.layers))
    hidden_s = min(layer_exchange_s, window_s)
    eff_overlap = compute_s / (
        compute_s + layer_exchange_s - hidden_s + psum_s)
    row = {
        "graph": kind,
        "shards": s,
        "nodes": v,
        "halo_form": form,
        "halo_rows_moved": rows_moved,
        "exchange_mb_per_layer": round(send_bytes / 1e6, 3),
        "compute_ms_per_layer": round(compute_s * 1e3, 3),
        "exchange_ms_per_layer": round(layer_exchange_s * 1e3, 3),
        "projected_efficiency": round(eff, 3),
        "projected_efficiency_overlap": round(eff_overlap, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def model_for(kind, build, args, reorder=False):
    """STRONG scaling (fixed graph, toy-batch Amdahl case) and WEAK scaling
    (constant per-shard work — how real deployments grow with the mesh)."""
    rng = np.random.RandomState(0)
    v, adj = build(rng, 1)
    for s in args.shards:
        compute_s = (args.step_ms / 1e3) / args.layers / s
        model_one(kind + "-strong", v, adj, s, compute_s, args, reorder)
    for s in args.shards:
        rng = np.random.RandomState(0)
        v, adj = build(rng, s)
        compute_s = (args.step_ms / 1e3) / args.layers  # constant per shard
        model_one(kind + "-weak", v, adj, s, compute_s, args, reorder)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--step-ms", type=float, default=8.8,
                        help="Measured single-chip full-step time at this "
                             "workload (PERFORMANCE.md headline).")
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--hidden", type=int, default=320)
    parser.add_argument("--itemsize", type=int, default=4,
                        help="Bytes per exchanged state element (states are "
                             "exchanged f32; the kernels cast after).")
    parser.add_argument("--ici-gbps", type=float, default=45.0,
                        help="ICI bandwidth per direction, GB/s (v5e link).")
    parser.add_argument("--param-bytes", type=int, default=4 * 1_700_000,
                        help="Gradient bytes all-reduced per step (PPI RGCN "
                             "~1.7M params f32).")
    parser.add_argument("--overlap-window-ms", type=float, default=0.12,
                        help="Single-chip per-layer transform time the halo "
                             "exchange can hide behind (measured, round-4 "
                             "bisection; a lower bound on the true window).")
    parser.add_argument("--shards", type=int, nargs="+",
                        default=[2, 4, 8, 16])
    args = parser.parse_args()

    model_for("ppi-bench-random", bench_shaped_graph, args)
    model_for("clustered", clustered_graph, args)
    # Latent locality hidden by a label shuffle: unrecoverable by the
    # contiguous-range partitioner alone, recovered by the RCM pass.
    model_for("shuffled-latent", shuffled_clustered_graph, args)
    model_for("shuffled-latent+rcm", shuffled_clustered_graph, args,
              reorder=True)


if __name__ == "__main__":
    main()
