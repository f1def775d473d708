"""Per-flavour training throughput: fused Pallas path vs XLA path.

Runs the PPI-shaped workload (bench.py constants) through every message-
passing flavour with and without scatter plans and prints one JSON line per
(flavour, path). Used to populate PERFORMANCE.md; run on a quiet machine —
host contention skews the differenced timings.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # noqa: E402


# Fast-path batch configuration per flavour: the joint-sum flavours ride the
# gather-free pair kernel in bfloat16 (as the shipped configs do — f32 tables
# exceed the VMEM residency budget and decline the pair path); FiLM and the
# target-state edge MLP additionally need MERGED-TARGET pair plans (the
# factorised node-space paths); RGAT runs the flash pair-attention kernels
# (ops/pair_attention.py) on NON-merged plans. Scatter plans are always
# built as the fused fallback.
FUSED_BATCH_KWARGS = {
    # Joint-sum flavours ride the per-type streamed plans since round 5
    # (full-width single-sweep resident slice — see PERFORMANCE.md r5).
    "rgcn": {"use_pallas": True, "use_pairs": True, "pair_per_type": True},
    "ggnn": {"use_pallas": True, "use_pairs": True, "pair_per_type": True},
    "rgin": {"use_pallas": True, "use_pairs": True, "pair_per_type": True},
    "gnn_edge_mlp": {"use_pallas": True, "use_pairs": True,
                     "pair_merge_targets": True},
    "gnn_film": {"use_pallas": True, "use_pairs": True,
                 "pair_merge_targets": True},
    "rgat": {"use_pallas": True, "use_pairs": True},
}

# Shipped-config stream dtype for the pair flavours; applied to BOTH the XLA
# and the fused run so speedups isolate the kernel, not the dtype.
FLAVOUR_PARAMS = {
    "rgcn": {"gnn_edge_dtype": "bfloat16"},
    "ggnn": {"gnn_edge_dtype": "bfloat16"},
    "rgin": {"gnn_edge_dtype": "bfloat16"},
    "gnn_edge_mlp": {"gnn_edge_dtype": "bfloat16"},
    "gnn_film": {"gnn_edge_dtype": "bfloat16"},
    "rgat": {"gnn_edge_dtype": "bfloat16"},
}


def run_flavour(flavour: str, use_pallas: bool) -> dict:
    import jax

    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import create_train_state, make_train_step
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

    params = NodeMulticlassTask.get_default_hyperparameters(flavour)
    params.update(
        {
            "gnn_hidden_dim": 320,
            "gnn_num_layers": 4,
            "learning_rate": 0.001,
        }
    )
    if flavour == "gnn_edge_mlp":
        params["gnn_num_edge_MLP_hidden_layers"] = 0  # shipped-config form
    if flavour == "rgat":
        params["gnn_num_heads"] = 4  # 320 % 4 == 0 (shipped PPI_RGAT value)
    params.update(FLAVOUR_PARAMS[flavour])
    model = NodeMulticlassTask.from_params(params)

    batch_kwargs = FUSED_BATCH_KWARGS[flavour] if use_pallas else {
        "use_pallas": False
    }
    batch, labels, edges = bench.build_batch(0, **batch_kwargs)
    batch = jax.device_put(batch)
    labels = jax.device_put(labels)
    optimizer = make_optimizer(params)
    state = create_train_state(model, batch, optimizer, seed=0)
    train_step = make_train_step(model, optimizer)

    def run(n, state):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = train_step(state, batch, labels)
        _ = float(np.asarray(metrics["loss"]))
        return time.perf_counter() - t0, state

    _, state = run(3, state)
    t1, state = run(8, state)
    t2, state = run(24, state)
    per_step = (t2 - t1) / 16
    return {
        "flavour": flavour,
        "path": "pallas" if use_pallas else "xla",
        "step_ms": round(per_step * 1e3, 2),
        "edges_per_s": round(edges / per_step, 1),
    }


def main():
    flavours = sys.argv[1:] or [
        "rgcn", "ggnn", "rgin", "gnn_edge_mlp", "gnn_film", "rgat"
    ]
    for flavour in flavours:
        for use_pallas in (False, True):
            result = run_flavour(flavour, use_pallas)
            print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
