"""Deterministic workloads shared by the 2-process cluster test.

Imported BOTH by the in-process reference (tests/test_multiprocess.py under
the 8-virtual-device conftest) and by the spawned cluster workers
(tests/multiprocess_worker.py) — identical data and identical seeds are what
make the cross-process losses comparable to the single-process ground truth.
"""
import numpy as np

NUM_DEVICES = 8
DP_AXIS = "data"
SPMD_AXIS = "nodes"


def _model_params():
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

    params = NodeMulticlassTask.get_default_hyperparameters("rgcn")
    params.update({
        "gnn_hidden_dim": 8,
        "gnn_num_layers": 2,
        "gnn_layer_input_dropout_rate": 0.0,
        "optimizer": "SGD",
        "momentum": 0.0,
        "learning_rate": 0.05,
    })
    return {k: v for k, v in params.items() if not k.startswith("_")}


def build_model():
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

    return NodeMulticlassTask.from_params(_model_params()), _model_params()


def build_dp_batches():
    """One small padded batch + labels per global device (stacked [8, ...])."""
    from tf2_gnn_tpu.data.graph_batch import (
        PaddingConfig, pad_batch_arrays, pad_node_label_array,
    )
    from tf2_gnn_tpu.parallel import stack_batches

    config = PaddingConfig(num_nodes=24, num_graphs=3, edge_budgets=(64, 64))
    batches, labels = [], []
    for i in range(NUM_DEVICES):
        rng = np.random.RandomState(100 + i)
        n = 16 + (i % 4)
        adj = [np.stack([rng.randint(0, n, 40), rng.randint(0, n, 40)],
                        axis=1).astype(np.int32) for _ in range(2)]
        batch = pad_batch_arrays(
            rng.randn(n, 6).astype(np.float32), adj,
            np.sort(rng.randint(0, 2, n)).astype(np.int32), 2, config,
        )
        y = (rng.rand(n, 121) > 0.9).astype(np.float32)
        batches.append(batch)
        labels.append({"node_labels": pad_node_label_array(y, 24)})
    return stack_batches(batches, labels)


def build_spmd_partition(halo="auto", build_pair_plans=False, seed=7,
                         num_shards=NUM_DEVICES, expect_reorder=False,
                         shuffle=True, reorder="auto", pair_per_type=False):
    """One giant localized graph partitioned over ``num_shards`` shards."""
    from tf2_gnn_tpu.parallel import partition_graph

    rng = np.random.RandomState(seed)
    num_nodes = 128
    tgt = rng.randint(0, num_nodes, 500)
    src = np.clip(tgt + rng.randint(-6, 7, 500), 0, num_nodes - 1)
    # SHUFFLED ids over latent-local connectivity: partition_graph's default
    # auto-RCM pass deterministically engages, so the multi-process suite
    # exercises the reordered labelling across a real process boundary
    # (losses are label-consistent, hence process-invariant).
    shuf = (rng.permutation(num_nodes).astype(np.int32) if shuffle
            else np.arange(num_nodes, dtype=np.int32))
    adj = [np.stack([shuf[src[:250]], shuf[tgt[:250]]], axis=1),
           np.stack([shuf[src[250:]], shuf[tgt[250:]]], axis=1)]
    n2g = np.sort(rng.randint(0, 3, num_nodes)).astype(np.int32)
    labels = (rng.rand(num_nodes, 121) > 0.9).astype(np.float32)
    batch, batch_labels = partition_graph(
        rng.randn(num_nodes, 6).astype(np.float32), adj, n2g, 3, num_shards,
        axis_name=SPMD_AXIS, num_graphs_padded=4,
        node_labels={"node_labels": labels},
        halo=halo, build_pair_plans=build_pair_plans, reorder=reorder,
        pair_per_type=pair_per_type,
    )
    if expect_reorder:
        # Only asserted where nodes_per_shard < num_nodes: the pair-plan
        # form aligns shards to BLOCK_NODES (128), which collapses this
        # 128-node workload to one populated shard (zero boundary — auto
        # correctly declines to relabel).
        assert batch.node_restore is not None, (
            "auto-reorder should engage on the shuffled latent-local "
            "workload")
    return batch, batch_labels


def run_steps(mesh_dp, mesh_spmd, lift, mesh_hybrid=None, lift2d=None):
    """One DP step + SPMD steps (both halo wire forms; the ring one on the
    BLOCK-PAIR kernel path) + one hybrid 2x4 step; returns the replicated
    losses and a param checksum.

    ``lift(tree, axis_name)`` turns host-local stacked arrays into mesh
    inputs (identity for the single-process reference, distribute_batch for
    cluster workers feeding their local shards); ``lift2d(tree)`` does the
    same for the hybrid [R, S, ...] stacks over ("data", "nodes").
    """
    import jax
    import numpy as np

    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import create_train_state
    from tf2_gnn_tpu.parallel import make_dp_train_step, make_spmd_train_step

    model, params = build_model()
    optimizer = make_optimizer(params)

    batch, labels = build_dp_batches()
    one = jax.tree.map(lambda x: x[0], batch)
    state = create_train_state(model, one, optimizer, seed=0)
    dp_step = make_dp_train_step(model, optimizer, mesh_dp, axis_name=DP_AXIS)
    state, dp_metrics = dp_step(state, lift(batch, DP_AXIS),
                                lift(labels, DP_AXIS))
    dp_loss = float(np.asarray(jax.device_get(dp_metrics["loss"])))

    # Param shapes depend only on feature dim/config — init from the plain
    # batch (a lone partitioned shard can't run its halo exchange outside
    # shard_map).
    spmd_step = make_spmd_train_step(model, optimizer, mesh_spmd,
                                     axis_name=SPMD_AXIS)
    result = {"dp_loss": dp_loss}
    for name, halo, pairs in (("spmd_loss", "dense", False),
                              ("spmd_ring_pair_loss", "ring", True),
                              ("spmd_typed_pair_loss", "ring", "typed")):
        sharded, sharded_labels = build_spmd_partition(
            halo=halo, build_pair_plans=bool(pairs),
            pair_per_type=pairs == "typed", expect_reorder=not pairs)
        assert (sharded.halo_ring_send is not None) == (halo == "ring")
        assert (sharded.pair_plans is not None) == (pairs is True)
        assert (sharded.pair_plans_typed is not None) == (pairs == "typed")
        state2 = create_train_state(model, one, optimizer, seed=0)
        state2, spmd_metrics = spmd_step(state2, lift(sharded, SPMD_AXIS),
                                         lift(sharded_labels, SPMD_AXIS))
        result[name] = float(np.asarray(jax.device_get(
            spmd_metrics["loss"])))

    if mesh_hybrid is not None:
        from tf2_gnn_tpu.parallel import (
            make_hybrid_train_step,
            stack_partitioned_batches,
        )

        # Hybrid replicas must share their STATIC batch structure (ext
        # slab sizes) to stack on the replica axis; the shuffled+reordered
        # labelling makes those seed-dependent, so this leg pins the
        # identity labelling (reorder rides the SPMD legs above).
        replicas = [build_spmd_partition(seed=40 + r, num_shards=4,
                                         shuffle=False, reorder=False)
                    for r in range(2)]
        batch2d, labels2d = stack_partitioned_batches(
            [b for b, _ in replicas], [l for _, l in replicas])
        state3 = create_train_state(model, one, optimizer, seed=0)
        hybrid_step = make_hybrid_train_step(model, optimizer, mesh_hybrid)
        state3, hybrid_metrics = hybrid_step(
            state3, lift2d(batch2d), lift2d(labels2d))
        result["hybrid_loss"] = float(np.asarray(jax.device_get(
            hybrid_metrics["loss"])))

    result["checksum"] = float(sum(
        np.abs(np.asarray(jax.device_get(p))).sum()
        for p in jax.tree.leaves(state.params)
    ))
    return result
