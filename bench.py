"""Headline benchmark: RGCN training throughput on a PPI-shaped workload.

Reference baseline (BASELINE.md): the tf2-gnn README quickstart trains RGCN on
PPI (4 layers, hidden 320, sum aggregation, normalize-by-incoming, 8000-node
batches) at 2.63 graphs/s (reference README.md:47, 2020-era unspecified
hardware). This benchmark builds the same shape of workload synthetically
(PPI: ~2400 nodes and ~34k forward edges per graph, untied backward edges,
self loops, 121 node labels), runs the full jitted training step (forward +
backward + Adam), and reports sustained edges/s per chip plus the graphs/s
ratio vs the reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}
"""
import json
import time

import numpy as np

# PPI-shaped workload constants.
NODES_PER_GRAPH = 2400
FWD_EDGES_PER_GRAPH = 34000
GRAPHS_PER_BATCH = 3
NUM_LABELS = 121
FEATURE_DIM = 50
NODE_BUDGET = 8064  # 63 * 128: Pallas node-block aligned
BASELINE_GRAPHS_PER_S = 2.63  # reference README.md:47

WARMUP_STEPS = 3
TIMED_STEPS_BASE = 10
TIMED_STEPS_FULL = 30


def build_raw_arrays(seed: int):
    """The bench workload's RAW graph arrays — the single source of truth
    for its composition (tests/test_bench_shapes.py partitions these same
    arrays for the SPMD fast-path pins, so a workload change propagates).
    Returns (node_features, [loops, fwd, bkwd] adjacency, node_to_graph)."""
    rng = np.random.RandomState(seed)
    v = GRAPHS_PER_BATCH * NODES_PER_GRAPH
    fwd_chunks, bkwd_chunks, loop_chunks = [], [], []
    for g in range(GRAPHS_PER_BATCH):
        base = g * NODES_PER_GRAPH
        src = rng.randint(0, NODES_PER_GRAPH, FWD_EDGES_PER_GRAPH) + base
        tgt = rng.randint(0, NODES_PER_GRAPH, FWD_EDGES_PER_GRAPH) + base
        fwd_chunks.append(np.stack([src, tgt], axis=1))
        bkwd_chunks.append(np.stack([tgt, src], axis=1))
        nodes = np.arange(base, base + NODES_PER_GRAPH)
        loop_chunks.append(np.stack([nodes, nodes], axis=1))
    adjacency = [
        np.concatenate(loop_chunks).astype(np.int32),
        np.concatenate(fwd_chunks).astype(np.int32),
        np.concatenate(bkwd_chunks).astype(np.int32),
    ]
    node_features = rng.randn(v, FEATURE_DIM).astype(np.float32)
    node_to_graph = np.repeat(
        np.arange(GRAPHS_PER_BATCH, dtype=np.int32), NODES_PER_GRAPH
    )
    return node_features, adjacency, node_to_graph


def build_batch(seed: int, use_pallas: bool = True, use_pairs: bool = False,
                pair_merge_targets: bool = False,
                pair_per_type: bool = False):
    from tf2_gnn_tpu.data.graph_batch import (
        PaddingConfig,
        pad_batch_arrays,
        pad_node_label_array,
    )

    rng = np.random.RandomState(seed)
    v = GRAPHS_PER_BATCH * NODES_PER_GRAPH
    node_features, (loops, fwd, bkwd), node_to_graph = build_raw_arrays(seed)

    def round_up(x, m=512):
        return ((x + m - 1) // m) * m

    config = PaddingConfig(
        num_nodes=NODE_BUDGET,
        num_graphs=GRAPHS_PER_BATCH + 1,
        edge_budgets=(
            round_up(loops.shape[0]),
            round_up(fwd.shape[0]),
            round_up(bkwd.shape[0]),
        ),
    )
    batch = pad_batch_arrays(
        node_features=node_features,
        adjacency_lists=[loops, fwd, bkwd],
        node_to_graph=node_to_graph,
        num_graphs=GRAPHS_PER_BATCH,
        config=config,
    )
    if use_pallas:
        from tf2_gnn_tpu.ops.spmm_pallas import build_merged_plans

        plan = build_merged_plans(
            [np.asarray(s_) for s_ in batch.edge_sources],
            [np.asarray(t_) for t_ in batch.edge_targets],
            [int(c) for c in np.asarray(batch.num_edges)],
            NODE_BUDGET,
        )
        batch = batch.replace(scatter_plans=plan.astuple())
    if use_pairs:
        from tf2_gnn_tpu.ops.pair_spmm import build_pair_plans, choose_pair_groups

        srcs = [np.asarray(s_) for s_ in batch.edge_sources]
        tgts = [np.asarray(t_) for t_ in batch.edge_targets]
        cnts = [int(c) for c in np.asarray(batch.num_edges)]
        if pair_per_type:
            # The shipped PPI_RGCN form since round 5: per-type row-split
            # plans ride the SINGLE-LAUNCH streamed kernel whose resident
            # slice is one type's [V, H] — small enough for a full-width
            # single sweep (5.21 vs 6.51 ms/step at this shape; groups
            # chosen from type 0 exactly as the dataset path does).
            gf, gb = choose_pair_groups([srcs[0]], [tgts[0]], [cnts[0]],
                                        NODE_BUDGET)
            typed = tuple(
                build_pair_plans([srcs[t]], [tgts[t]], [cnts[t]],
                                 NODE_BUDGET, group_fwd=gf,
                                 group_bwd=gb).astuple()
                for t in range(len(srcs))
            )
            batch = batch.replace(pair_plans_typed=typed)
        else:
            # Adaptive grid groups, exactly as the dataset path chooses
            # them (graph_dataset.py): merged-target plans fragment output
            # runs (L*V target blocks), where GROUP-8 measures 3256 fwd
            # chunks vs GROUP-16's 4624 at this shape; joint plans 16/8.
            gf, gb = choose_pair_groups(srcs, tgts, cnts, NODE_BUDGET,
                                        merge_targets=pair_merge_targets)
            pairs = build_pair_plans(
                srcs, tgts, cnts, NODE_BUDGET,
                overflow_budget=256,
                merge_targets=pair_merge_targets,
                group_fwd=gf, group_bwd=gb,
            )
            batch = batch.replace(pair_plans=pairs.astuple(),
                                  pair_targets_merged=pair_merge_targets)
    labels = {
        "node_labels": pad_node_label_array(
            (rng.rand(v, NUM_LABELS) > 0.9).astype(np.float32), NODE_BUDGET
        )
    }
    real_edges = loops.shape[0] + fwd.shape[0] + bkwd.shape[0]
    return batch, labels, real_edges


def build_qm9_batch(seed: int):
    """QM9-shaped workload: 909 ~18-node molecules, 5 edge types, ~50k edges
    per 16k-node batch, per-type row-split pair plans (the shipped QM9_RGCN
    configuration's pair_per_type form)."""
    from tf2_gnn_tpu.data.graph_batch import (
        PaddingConfig,
        pad_batch_arrays,
        pad_graph_label_array,
    )
    from tf2_gnn_tpu.ops.pair_spmm import build_pair_plans, choose_pair_groups

    rng = np.random.RandomState(seed)
    mols, nodes_per_mol, num_types = 909, 18, 5
    v = mols * nodes_per_mol
    v_pad = 16384  # 128 * 128, Pallas node-block aligned
    adjacency = []
    for t in range(num_types):
        e_per_mol = 11
        src = rng.randint(0, nodes_per_mol, (mols, e_per_mol))
        tgt = rng.randint(0, nodes_per_mol, (mols, e_per_mol))
        base = (np.arange(mols) * nodes_per_mol)[:, None]
        adjacency.append(np.stack(
            [(src + base).reshape(-1), (tgt + base).reshape(-1)],
            axis=1).astype(np.int32))
    config = PaddingConfig(
        num_nodes=v_pad,
        num_graphs=mols + 1,
        edge_budgets=tuple(((a.shape[0] + 511) // 512) * 512
                           for a in adjacency),
    )
    batch = pad_batch_arrays(
        node_features=rng.randn(v, 32).astype(np.float32),
        adjacency_lists=adjacency,
        node_to_graph=np.repeat(np.arange(mols, dtype=np.int32),
                                nodes_per_mol),
        num_graphs=mols,
        config=config,
    )
    gf, gb = choose_pair_groups(
        [np.asarray(batch.edge_sources[0])],
        [np.asarray(batch.edge_targets[0])],
        [int(batch.num_edges[0])], v_pad,
    )
    typed = tuple(
        build_pair_plans(
            [np.asarray(batch.edge_sources[t])],
            [np.asarray(batch.edge_targets[t])],
            [int(batch.num_edges[t])], v_pad,
            group_fwd=gf, group_bwd=gb,
        ).astuple()
        for t in range(num_types)
    )
    batch = batch.replace(pair_plans_typed=typed)
    labels = {"target_value": pad_graph_label_array(
        rng.randn(mols).astype(np.float32), mols + 1)}
    return batch, labels, mols


# Ambient host/tunnel load historically swings a single differenced
# measurement by up to ~13% (BENCH_r03 vs r04 QM9); the bench therefore
# repeats every family's measurement and reports the median, with the
# min..max spread recorded so a recorded delta can be told apart from
# noise. On a quiet host the half-range stays within this tolerance;
# the JSON carries "noisy": true when it doesn't, which means the VALUE
# cannot distinguish a regression smaller than the spread.
MEASURE_REPS = 5
SPREAD_TOLERANCE_PCT = 3.0


def _timed_steps(train_step, state, batch, labels,
                 base_steps: int = 8, full_steps: int = 24,
                 reps: int = MEASURE_REPS,
                 min_run_s: float = 0.4):
    """Differenced host-forced step timing shared by every bench metric:
    warm up, then time two run lengths and difference them (the final host
    transfer forces completion; block_until_ready returns early through the
    axon tunnel, and differencing cancels that fixed cost). The differenced
    measurement is repeated ``reps`` times (one warmup/compile); returns a
    sorted list of seconds-per-step samples — callers take the median and
    report the spread.

    Run lengths scale up so the SHORT run lasts >= ``min_run_s``: a fast
    step (the 5 ms headline) over the stock 8/24 steps gives ~40/125 ms
    windows, where ±10-20 ms of tunnel jitter reads as ±15% spread — the
    same jitter over >=400 ms windows is ~2% (the longer-step families
    measure ±0.3% with no scaling)."""
    import jax

    def run(n, state):
        t0 = time.perf_counter()
        for i in range(n):
            if isinstance(batch, list):
                b, l = batch[i % len(batch)], labels[i % len(labels)]
            else:
                b, l = batch, labels
            state, metrics = train_step(state, b, l)
        _ = float(np.asarray(metrics["loss"]))
        return time.perf_counter() - t0, state

    _, state = run(WARMUP_STEPS, state)
    t_probe, state = run(base_steps, state)
    if t_probe < min_run_s:
        factor = int(np.ceil(min_run_s / max(t_probe, 1e-3)))
        base_steps *= factor
        full_steps *= factor
    samples = []
    for _ in range(reps):
        t_base, state = run(base_steps, state)
        t_full, state = run(full_steps, state)
        samples.append((t_full - t_base) / (full_steps - base_steps))
    return sorted(samples)


def _median_and_spread(samples):
    """(median, half-range as % of median) of seconds-per-step samples."""
    med = float(np.median(samples))
    half_range_pct = 100.0 * (samples[-1] - samples[0]) / 2.0 / med
    return med, half_range_pct


def main():
    import sys

    import jax

    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import create_train_state, make_train_step
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

    # The shipped PPI_RGCN configuration (tf2-gnn default_hypers/PPI_RGCN.json
    # == harness/default_hypers/PPI_RGCN.json): 4 layers, hidden 320,
    # normalize-by-incoming, input dropout 0.1, and dense/residual/global-
    # exchange all disabled (every_num_layers=10000). The edge stream runs the
    # gather-free block-pair kernel in bfloat16 (ops/pair_spmm.py), matching
    # the shipped config's use_pair_spmm/edge_dtype settings; pass --no-pairs
    # to time the sorted gather+scatter path instead.
    def measure(use_pairs: bool, use_pallas: bool,
                pair_per_type: bool = False):
        params = NodeMulticlassTask.get_default_hyperparameters("rgcn")
        params.update(
            {
                "gnn_hidden_dim": 320,
                "gnn_num_layers": 4,
                "gnn_normalize_by_num_incoming": True,
                "gnn_layer_input_dropout_rate": 0.1,
                "gnn_dense_every_num_layers": 10000,
                "gnn_residual_every_num_layers": 10000,
                "gnn_global_exchange_every_num_layers": 10000,
                "learning_rate": 0.001,
            }
        )
        if use_pairs:
            params["gnn_edge_dtype"] = "bfloat16"
        model = NodeMulticlassTask.from_params(params)

        batches = [build_batch(seed, use_pallas=use_pallas,
                               use_pairs=use_pairs,
                               pair_per_type=pair_per_type)
                   for seed in range(2)]
        edges_per_step = batches[0][2]

        optimizer = make_optimizer(params)
        state = create_train_state(model, batches[0][0], optimizer, seed=0)
        train_step = make_train_step(model, optimizer)

        # Move batches to device once (the measured loop is pure device
        # compute).
        device_b = [jax.device_put(b) for b, _, _ in batches]
        device_l = [jax.device_put(l) for _, l, _ in batches]
        samples = _timed_steps(train_step, state, device_b, device_l,
                               TIMED_STEPS_BASE, TIMED_STEPS_FULL)
        per_step, spread_pct = _median_and_spread(samples)
        return (edges_per_step / per_step, GRAPHS_PER_BATCH / per_step,
                spread_pct)

    def measure_rgat():
        """RGAT edges/s on the same PPI-shaped batch (pair-attention path,
        4 heads, bf16 streams — the shipped PPI_RGAT settings)."""
        params = NodeMulticlassTask.get_default_hyperparameters("rgat")
        params.update({
            "gnn_hidden_dim": 320,
            "gnn_num_layers": 4,
            "gnn_num_heads": 4,
            "gnn_edge_dtype": "bfloat16",
            "learning_rate": 0.001,
        })
        model = NodeMulticlassTask.from_params(params)
        batch, labels, edges = build_batch(0, use_pallas=False,
                                           use_pairs=True)
        batch = jax.device_put(batch)
        labels = jax.device_put(labels)
        optimizer = make_optimizer(params)
        state = create_train_state(model, batch, optimizer, seed=0)
        train_step = make_train_step(model, optimizer)
        per_step, spread_pct = _median_and_spread(
            _timed_steps(train_step, state, batch, labels))
        return edges / per_step, spread_pct

    def measure_qm9():
        """QM9 molecules/s on the shipped QM9_RGCN config (8 layers, hidden
        128, RMSProp, per-type row-split pair plans)."""
        import json as _json
        from pathlib import Path

        from tf2_gnn_tpu.models.qm9_regression_task import QM9RegressionTask

        hyper_path = (Path(__file__).parent / "tf2_gnn_tpu" / "harness"
                      / "default_hypers" / "QM9_RGCN.json")
        shipped = _json.loads(hyper_path.read_text())
        params = QM9RegressionTask.get_default_hyperparameters("rgcn")
        params.update(shipped["model_params"])
        model = QM9RegressionTask.from_params(params)
        batch, labels, mols = build_qm9_batch(0)
        batch = jax.device_put(batch)
        labels = jax.device_put(labels)
        optimizer = make_optimizer(params)
        state = create_train_state(model, batch, optimizer, seed=0)
        train_step = make_train_step(model, optimizer)
        per_step, spread_pct = _median_and_spread(
            _timed_steps(train_step, state, batch, labels))
        return mols / per_step, spread_pct

    # Fastest path first; a Mosaic/compile failure in a newer kernel family
    # falls back so the driver always records a number (the failure is
    # reported on stderr for the runbook to chase).
    if "--no-pairs" in sys.argv:
        paths = [("sorted", False, True, False)]
    else:
        # Fastest first: per-type streamed plans (the shipped PPI_RGCN
        # config since round 5), then merged plans, then the sorted
        # scatter, then plain XLA.
        paths = [("pairs-typed", True, False, True),
                 ("pairs", True, False, False),
                 ("sorted", False, True, False),
                 ("xla", False, False, False)]
    edges_per_s = graphs_per_s = None
    path_used = None
    headline_spread = None
    for name, use_pairs, use_pallas, per_type in paths:
        try:
            edges_per_s, graphs_per_s, headline_spread = measure(
                use_pairs, use_pallas, pair_per_type=per_type)
            path_used = name
            break
        except Exception as exc:  # pragma: no cover - device-only fallback
            print(f"bench path '{name}' failed ({type(exc).__name__}: "
                  f"{exc}); falling back", file=sys.stderr)
    if edges_per_s is None:
        raise SystemExit("every bench path failed")

    # Secondary per-kernel-family metrics (VERDICT r2 item 5): regressions in
    # the attention kernels or the per-type row-split plans would be
    # invisible to the RGCN headline. Soft-fail so the headline always
    # lands, and skip under a wall-clock budget so a slow remote-compile
    # day cannot push the whole run past a driver timeout (the headline
    # JSON prints only at the end).
    import os

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    start = time.perf_counter()
    extra = {"rgcn_spread_pct": round(headline_spread, 2),
             "measure_reps": MEASURE_REPS,
             "spread_tolerance_pct": SPREAD_TOLERANCE_PCT}
    if "--headline-only" not in sys.argv:
        for key, fn in (("rgat_edges_per_s", measure_rgat),
                        ("qm9_molecules_per_s", measure_qm9)):
            if time.perf_counter() - start > budget_s:
                print(f"bench extra '{key}' skipped (over BENCH_BUDGET_S="
                      f"{budget_s:.0f}s)", file=sys.stderr)
                extra[key] = None
                continue
            try:
                value, spread_pct = fn()
                extra[key] = round(value, 1)
                extra[key.split("_")[0] + "_spread_pct"] = round(spread_pct, 2)
            except Exception as exc:  # pragma: no cover - device-only
                print(f"bench extra '{key}' failed ({type(exc).__name__}: "
                      f"{exc})", file=sys.stderr)
                extra[key] = None

    spreads = [v for k, v in extra.items()
               if k.endswith("_spread_pct") and v is not None]
    noisy = bool(spreads) and max(spreads) > SPREAD_TOLERANCE_PCT

    print(
        json.dumps(
            {
                "metric": "train_edges_per_s_per_chip_rgcn_L4_d320_ppi_shaped",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(graphs_per_s / BASELINE_GRAPHS_PER_S, 2),
                "path": path_used,
                # Every value is the MEDIAN of MEASURE_REPS differenced
                # measurements; *_spread_pct is each family's half-range as
                # a percent of its median. "noisy" means some family's
                # spread exceeded SPREAD_TOLERANCE_PCT — deltas vs earlier
                # rounds smaller than that spread are ambient, not code.
                "noisy": noisy,
                **({"extra": extra} if extra else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
