"""Degree-skew throughput probe (VERDICT r3 item 6 / SURVEY §7 hard part 3).

All shipped perf workloads draw degrees uniformly; real graphs (PPI
included) are power-law. This probe runs the RGCN train step at the PPI
bench shape with intra-graph Zipf target degrees and prints one JSON line
per exponent alongside the uniform baseline — edges/s plus the measured
pair-plan chunk counts, so a planner regression on skew shows up as either
number. CPU companion: tests/test_degree_skew.py pins the chunk bounds.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # noqa: E402


def build_skewed_batch(seed: int, zipf_a):
    """bench.build_batch's graph layout with Zipf-distributed intra-graph
    target degrees (``zipf_a=None`` -> uniform, the bench workload)."""
    from tf2_gnn_tpu.data.graph_batch import (
        PaddingConfig,
        pad_batch_arrays,
        pad_node_label_array,
    )
    from tf2_gnn_tpu.ops.pair_spmm import build_pair_plans

    rng = np.random.RandomState(seed)
    graphs, npg = bench.GRAPHS_PER_BATCH, bench.NODES_PER_GRAPH
    v = graphs * npg

    def intra_targets(n):
        if zipf_a is None:
            return rng.randint(0, npg, n)
        z = rng.zipf(zipf_a, n * 3) - 1
        return z[z < npg][:n]

    fwd_chunks, bkwd_chunks, loop_chunks = [], [], []
    for g in range(graphs):
        base = g * npg
        src = rng.randint(0, npg, bench.FWD_EDGES_PER_GRAPH) + base
        tgt = intra_targets(bench.FWD_EDGES_PER_GRAPH) + base
        fwd_chunks.append(np.stack([src, tgt], axis=1))
        bkwd_chunks.append(np.stack([tgt, src], axis=1))
        nodes = np.arange(base, base + npg)
        loop_chunks.append(np.stack([nodes, nodes], axis=1))
    fwd = np.concatenate(fwd_chunks).astype(np.int32)
    bkwd = np.concatenate(bkwd_chunks).astype(np.int32)
    loops = np.concatenate(loop_chunks).astype(np.int32)

    def round_up(x, m=512):
        return ((x + m - 1) // m) * m

    config = PaddingConfig(
        num_nodes=bench.NODE_BUDGET,
        num_graphs=graphs + 1,
        edge_budgets=(round_up(loops.shape[0]), round_up(fwd.shape[0]),
                      round_up(bkwd.shape[0])),
    )
    batch = pad_batch_arrays(
        node_features=rng.randn(v, bench.FEATURE_DIM).astype(np.float32),
        adjacency_lists=[loops, fwd, bkwd],
        node_to_graph=np.repeat(np.arange(graphs, dtype=np.int32), npg),
        num_graphs=graphs,
        config=config,
    )
    # The SHIPPED PPI form since round 5: per-type row-split plans on the
    # streamed single-sweep kernel.
    typed = tuple(
        build_pair_plans(
            [np.asarray(batch.edge_sources[t])],
            [np.asarray(batch.edge_targets[t])],
            [int(np.asarray(batch.num_edges)[t])],
            bench.NODE_BUDGET, group_fwd=8, group_bwd=8,
        ).astuple()
        for t in range(3)
    )
    chunks = (sum(np.asarray(p[2]).shape[0] for p in typed),
              sum(np.asarray(p[6]).shape[0] for p in typed))
    batch = batch.replace(pair_plans_typed=typed)
    labels = {"node_labels": pad_node_label_array(
        (rng.rand(v, bench.NUM_LABELS) > 0.9).astype(np.float32),
        bench.NODE_BUDGET)}
    edges = loops.shape[0] + fwd.shape[0] + bkwd.shape[0]
    return batch, labels, edges, chunks


def run(zipf_a) -> dict:
    import jax

    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import create_train_state, make_train_step
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

    params = NodeMulticlassTask.get_default_hyperparameters("rgcn")
    params.update({"gnn_hidden_dim": 320, "gnn_num_layers": 4,
                   "learning_rate": 0.001, "gnn_edge_dtype": "bfloat16"})
    model = NodeMulticlassTask.from_params(params)
    batch, labels, edges, chunks = build_skewed_batch(0, zipf_a)
    batch = jax.device_put(batch)
    labels = jax.device_put(labels)
    optimizer = make_optimizer(params)
    state = create_train_state(model, batch, optimizer, seed=0)
    train_step = make_train_step(model, optimizer)

    def loop(n, state):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = train_step(state, batch, labels)
        _ = float(np.asarray(metrics["loss"]))
        return time.perf_counter() - t0, state

    _, state = loop(3, state)
    t1, state = loop(8, state)
    t2, state = loop(24, state)
    per_step = (t2 - t1) / 16
    return {
        "degrees": "uniform" if zipf_a is None else f"zipf a={zipf_a}",
        "step_ms": round(per_step * 1e3, 2),
        "edges_per_s": round(edges / per_step, 1),
        "fwd_chunks": chunks[0],
        "bwd_chunks": chunks[1],
    }


def main():
    for a in (None, 2.0, 1.1):
        print(json.dumps(run(a)), flush=True)


if __name__ == "__main__":
    main()
