"""Target-state 1-hidden edge MLP (the reference's DEFAULT GNN_Edge_MLP
config, tf2_gnn gnn_edge_mlp.py:48-52) at the PPI bench shape: the dedicated
pair kernel (ops/pair_edge_mlp.py) vs the commuted-W2 scatter-plan fallback
vs plain XLA. One JSON line per path; run on a quiet host.
"""
import json
import sys
import time
from pathlib import Path
from unittest import mock

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # noqa: E402


def run(path: str, num_hidden: int = 1) -> dict:
    import jax

    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import create_train_state, make_train_step
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask
    from tf2_gnn_tpu.ops import pair_edge_mlp as pem

    params = NodeMulticlassTask.get_default_hyperparameters("gnn_edge_mlp")
    params.update(
        {
            "gnn_hidden_dim": 320,
            "gnn_num_layers": 4,
            "learning_rate": 0.001,
            # 1 = the reference default; 2+ = the deep form (an MLP of a
            # concat neither factorises nor commutes past its inner relus,
            # so it keeps the per-edge XLA path — this probe BOUNDS that).
            "gnn_num_edge_MLP_hidden_layers": num_hidden,
            "gnn_edge_dtype": "bfloat16",
        }
    )
    model = NodeMulticlassTask.from_params(params)

    if path == "xla":
        batch_kwargs = {"use_pallas": False}
    else:
        batch_kwargs = {"use_pallas": True, "use_pairs": True,
                        "pair_merge_targets": True}
    batch, labels, edges = bench.build_batch(0, **batch_kwargs)
    batch = jax.device_put(batch)
    labels = jax.device_put(labels)
    optimizer = make_optimizer(params)

    import contextlib

    ctx = (mock.patch.object(pem, "pair_edge_mlp_applicable",
                             return_value=False)
           if path == "scatter" else contextlib.nullcontext())
    with ctx:
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
        "config": f"edge_mlp target-state {num_hidden}-hidden"
                  + (" (reference default)" if num_hidden == 1 else ""),
        "path": path,
        "step_ms": round(per_step * 1e3, 2),
        "edges_per_s": round(edges / per_step, 1),
    }


def main():
    paths = sys.argv[1:] or ["xla", "scatter", "pair"]
    for p in paths:
        if p.startswith("deep"):
            # "deep" / "deep3": the >= 2-hidden form on its shipped
            # routing (per-edge XLA; scatter plans absent -> plain path).
            nh = int(p[4:] or 2)
            print(json.dumps(run("xla", num_hidden=nh)), flush=True)
        else:
            print(json.dumps(run(p)), flush=True)


if __name__ == "__main__":
    main()
