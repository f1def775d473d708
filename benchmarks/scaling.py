"""Edges/s scaling-efficiency harness for SPMD node-partitioned training.

BASELINE.md target: >= 80% edges/s scaling efficiency at 1 chip / 1 host /
N>=2 hosts for an RGIN relational graph edge-partitioned across the mesh
(BASELINE.json config 5). This harness trains an RGIN NodeMulticlass model on
ONE synthetic giant relational graph partitioned over 1..N devices and prints
edges/s plus efficiency relative to the 1-device run scaled linearly.

Run on real hardware:      python benchmarks/scaling.py
Smoke on a virtual mesh:   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                           python benchmarks/scaling.py --nodes-per-device 512 --edges-per-device 4096
(virtual-CPU efficiency numbers are not meaningful — the devices share one
core — but the harness exercises the identical program.)
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def run_at(n_devices, nodes_per_device, edges_per_device, hidden, layers, steps):
    import jax

    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import create_train_state
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask
    from tf2_gnn_tpu.parallel import make_mesh, make_spmd_train_step, partition_graph

    num_nodes = nodes_per_device * n_devices
    num_edges = edges_per_device * n_devices
    rng = np.random.RandomState(0)
    nf = rng.randn(num_nodes, 32).astype(np.float32)
    adjacency = [
        np.stack([rng.randint(0, num_nodes, num_edges // 2),
                  rng.randint(0, num_nodes, num_edges // 2)], axis=1
                 ).astype(np.int32)
        for _ in range(2)
    ]
    node_to_graph = np.zeros(num_nodes, dtype=np.int32)
    labels = (rng.rand(num_nodes, 121) > 0.9).astype(np.float32)

    params = NodeMulticlassTask.get_default_hyperparameters("rgin")
    params.update({"gnn_hidden_dim": hidden, "gnn_num_layers": layers,
                   "gnn_edge_dtype": "bfloat16",
                   "gnn_global_exchange_every_num_layers": 10000})
    model = NodeMulticlassTask.from_params(params)
    optimizer = make_optimizer(params)

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices, axis_name="nodes")
    batch, batch_labels = partition_graph(
        nf, adjacency, node_to_graph, num_graphs=1, num_shards=n_devices,
        num_graphs_padded=2, node_labels={"node_labels": labels},
        build_pair_plans=True,  # every shard rides the block-pair fast path
    )
    template = jax.tree.map(lambda x: x[0], batch).replace(spmd_axis=None)
    state = create_train_state(model, template, optimizer, seed=0)
    step = make_spmd_train_step(model, optimizer, mesh)

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, batch_labels)
        _ = float(np.asarray(metrics["loss"]))
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(steps // 3), run(steps)
    per_step = (t2 - t1) / (steps - steps // 3)
    return num_edges / per_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes-per-device", type=int, default=4096)
    parser.add_argument("--edges-per-device", type=int, default=131072)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--steps", type=int, default=15)
    args = parser.parse_args()

    import jax

    available = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= available]
    results = {}
    for n in sizes:
        eps = run_at(n, args.nodes_per_device, args.edges_per_device,
                     args.hidden, args.layers, args.steps)
        eff = eps / (results[1] * n) if 1 in results else 1.0
        results[n] = eps
        print(json.dumps({
            "devices": n,
            "edges_per_s": round(eps, 1),
            "scaling_efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
