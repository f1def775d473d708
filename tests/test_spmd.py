"""SPMD node-partitioned giant-graph execution vs single-device ground truth.

The defining correctness property: partitioning a graph over the 8-virtual-
device mesh and running the halo-exchange path must reproduce the exact
single-device forward outputs, losses, and gradients for every MP flavour and
every graph-level reduction (readouts, exchange, per-node losses).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.data.graph_batch import PaddingConfig, pad_batch_arrays
from tf2_gnn_tpu.harness.optimizers import make_optimizer
from tf2_gnn_tpu.harness.training import create_train_state, make_train_step
from tf2_gnn_tpu.models.graph_regression_task import GraphRegressionTask
from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask
from tf2_gnn_tpu.parallel import (
    make_mesh,
    make_spmd_eval_step,
    make_spmd_forward,
    make_spmd_train_step,
    partition_graph,
    restore_node_order,
)

NUM_SHARDS = 8


def _giant_graph(num_nodes=96, num_edge_types=2, edges_per_type=300,
                 feature_dim=12, num_graphs=3, seed=0):
    rng = np.random.RandomState(seed)
    node_features = rng.randn(num_nodes, feature_dim).astype(np.float32)
    adjacency = [
        np.stack(
            [rng.randint(0, num_nodes, edges_per_type),
             rng.randint(0, num_nodes, edges_per_type)],
            axis=1,
        ).astype(np.int32)
        for _ in range(num_edge_types)
    ]
    node_to_graph = np.sort(rng.randint(0, num_graphs, num_nodes)).astype(np.int32)
    return node_features, adjacency, node_to_graph, num_graphs


def _single_device_batch(node_features, adjacency, node_to_graph, num_graphs,
                         num_graphs_padded):
    num_nodes = node_features.shape[0]
    config = PaddingConfig(
        num_nodes=num_nodes + 8,
        num_graphs=num_graphs_padded,
        edge_budgets=tuple(a.shape[0] + 16 for a in adjacency),
    )
    return pad_batch_arrays(node_features, adjacency, node_to_graph,
                            num_graphs, config)


def _model_params(task_cls, flavour, **extra):
    params = task_cls.get_default_hyperparameters(flavour)
    params.update(
        {
            "gnn_hidden_dim": 12,
            "gnn_num_layers": 3,
            "gnn_layer_input_dropout_rate": 0.0,
            "graph_aggregation_dropout_rate": 0.0,
            "regression_mlp_dropout": 0.0,
            "gnn_global_exchange_dropout_rate": 0.0,
        }
    )
    params.update(extra)
    return {k: v for k, v in params.items() if not k.startswith("_")}


@pytest.mark.parametrize("halo_form", ["dense", "ring"])
@pytest.mark.parametrize(
    "flavour", ["rgcn", "ggnn", "rgat", "rgin", "gnn_edge_mlp", "gnn_film"]
)
def test_spmd_forward_matches_single_device(flavour, halo_form):
    nf, adj, n2g, g = _giant_graph()
    params = _model_params(NodeMulticlassTask, flavour)
    model = NodeMulticlassTask.from_params(params)

    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    mesh = make_mesh(axis_name="nodes")
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4, halo=halo_form)
    assert (sharded.halo_ring_send is not None) == (halo_form == "ring")
    fwd = make_spmd_forward(model, mesh)
    (spmd_logits,) = fwd(variables["params"], sharded)
    spmd_flat = restore_node_order(spmd_logits, sharded)

    np.testing.assert_allclose(
        np.asarray(ref_logits)[: nf.shape[0]],
        spmd_flat[: nf.shape[0]],
        rtol=2e-4, atol=2e-5,
    )


def test_halo_form_heuristic_prefers_ring_for_local_graphs():
    """Locality-sorted connectivity -> per-distance ppermute ring (only
    neighbour distances active); scattered connectivity -> dense
    all_to_all. Ring plans also move strictly fewer rows."""
    rng = np.random.RandomState(11)
    v = 96
    nodes = np.arange(v)
    local_src = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    local_tgt = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    local_adj = [np.stack([local_src, local_tgt], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)
    # reorder=False: this test pins the WIRE-FORM heuristic to the given
    # labelling; the auto-RCM pass would relabel the scattered case.
    ring, _ = partition_graph(nf, local_adj, n2g, 1, NUM_SHARDS,
                              reorder=False)
    assert ring.halo_ring_send is not None
    # Only nearest-neighbour ring distances are active (ids within +-3).
    assert set(ring.halo_ring_dists) <= {1, NUM_SHARDS - 1}

    rand_adj = [np.stack([rng.randint(0, v, 400),
                          rng.randint(0, v, 400)], 1).astype(np.int32)]
    dense, _ = partition_graph(nf, rand_adj, n2g, 1, NUM_SHARDS,
                               reorder=False)
    assert dense.halo_send_idx is not None and dense.halo_ring_send is None


def test_spmd_forward_with_global_exchange_and_layernorm():
    nf, adj, n2g, g = _giant_graph(seed=3)
    params = _model_params(
        NodeMulticlassTask, "rgcn",
        gnn_global_exchange_every_num_layers=1,
        gnn_use_inter_layer_layernorm=True,
        gnn_global_exchange_mode="gru",
    )
    model = NodeMulticlassTask.from_params(params)
    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    mesh = make_mesh(axis_name="nodes")
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4)
    (spmd_logits,) = make_spmd_forward(model, mesh)(variables["params"], sharded)
    spmd_flat = restore_node_order(spmd_logits, sharded)
    np.testing.assert_allclose(
        np.asarray(ref_logits)[: nf.shape[0]], spmd_flat[: nf.shape[0]],
        rtol=2e-4, atol=2e-5,
    )


def test_spmd_graph_regression_readout_matches():
    nf, adj, n2g, g = _giant_graph(seed=5)
    params = _model_params(GraphRegressionTask, "rgcn")
    model = GraphRegressionTask.from_params(params)
    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    ref_out = np.asarray(model.apply(variables, single, False))

    mesh = make_mesh(axis_name="nodes")
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4)
    spmd_out = np.asarray(
        make_spmd_forward(model, mesh)(variables["params"], sharded)
    )
    # Graph-level outputs are replicated on every shard.
    for s in range(NUM_SHARDS):
        np.testing.assert_allclose(spmd_out[s], spmd_out[0], atol=1e-6)
    np.testing.assert_allclose(ref_out[:g], spmd_out[0][:g], rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("halo_form", ["dense", "ring"])
def test_spmd_train_step_matches_single_device(halo_form):
    """One SGD step on the partitioned graph == one step on the full graph
    (gradients flow back through whichever halo collective is in use)."""
    nf, adj, n2g, g = _giant_graph(seed=7)
    labels_np = (np.random.RandomState(1).rand(nf.shape[0], 121) > 0.9).astype(
        np.float32
    )
    params = _model_params(NodeMulticlassTask, "rgcn")
    params.update({"optimizer": "SGD", "momentum": 0.0, "learning_rate": 0.05})
    model = NodeMulticlassTask.from_params(params)
    optimizer = make_optimizer(params)

    # Single device.
    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    from tf2_gnn_tpu.data.graph_batch import pad_node_label_array

    single_labels = {
        "node_labels": pad_node_label_array(labels_np, single.num_nodes_padded)
    }
    state_a = create_train_state(model, single, optimizer, seed=0)
    local_step = make_train_step(model, optimizer)
    state_a, m_a = local_step(state_a, single, single_labels)

    # SPMD over 8 shards.
    mesh = make_mesh(axis_name="nodes")
    sharded, sharded_labels = partition_graph(
        nf, adj, n2g, g, NUM_SHARDS, num_graphs_padded=4,
        node_labels={"node_labels": labels_np}, halo=halo_form,
    )
    state_b = create_train_state(model, single, optimizer, seed=0)
    spmd_step = make_spmd_train_step(model, optimizer, mesh)
    state_b, m_b = spmd_step(state_b, sharded, sharded_labels)

    # Edge sums run in shard order vs global order -> f32 accumulation noise;
    # F1 additionally thresholds near-zero logits of the untrained model, so a
    # few predictions flip under that noise.
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_a["f1_score"]), float(m_b["f1_score"]),
                               atol=5e-3)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-3,
                                   atol=5e-4)


def test_spmd_eval_step_metrics_replicated():
    nf, adj, n2g, g = _giant_graph(seed=9)
    labels_np = (np.random.RandomState(2).rand(nf.shape[0], 121) > 0.9).astype(
        np.float32
    )
    params = _model_params(NodeMulticlassTask, "rgin")
    model = NodeMulticlassTask.from_params(params)
    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)

    mesh = make_mesh(axis_name="nodes")
    sharded, sharded_labels = partition_graph(
        nf, adj, n2g, g, NUM_SHARDS, num_graphs_padded=4,
        node_labels={"node_labels": labels_np},
    )
    metrics = make_spmd_eval_step(model, mesh)(
        variables["params"], sharded, sharded_labels
    )
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["f1_score"]) <= 1.0


def test_hybrid_2d_mesh_matches_single_device():
    """2x4 (data x nodes) hybrid step == single-device step on pooled data."""
    from tf2_gnn_tpu.parallel import (
        make_hybrid_mesh,
        make_hybrid_train_step,
        stack_partitioned_batches,
    )
    from tf2_gnn_tpu.harness.training import make_train_step

    params = _model_params(NodeMulticlassTask, "rgcn")
    params.update({"optimizer": "SGD", "momentum": 0.0, "learning_rate": 0.05})
    model = NodeMulticlassTask.from_params(params)
    optimizer = make_optimizer(params)

    replicas = []
    singles = []
    for r in range(2):
        nf, adj, n2g, g = _giant_graph(seed=20 + r)
        labels_np = (np.random.RandomState(30 + r).rand(nf.shape[0], 121) > 0.9
                     ).astype(np.float32)
        sharded, sharded_labels = partition_graph(
            nf, adj, n2g, g, 4, num_graphs_padded=4,
            node_labels={"node_labels": labels_np},
        )
        replicas.append((sharded, sharded_labels))
        singles.append((nf, adj, n2g, g, labels_np))

    mesh = make_hybrid_mesh(2, 4)
    batch2d, labels2d = stack_partitioned_batches(
        [b for b, _ in replicas], [l for _, l in replicas]
    )

    template = jax.tree.map(lambda x: x[0][0], batch2d).replace(spmd_axis=None)
    state_h = create_train_state(model, template, optimizer, seed=0)
    hybrid_step = make_hybrid_train_step(model, optimizer, mesh)
    state_h, m_h = hybrid_step(state_h, batch2d, labels2d)
    assert np.isfinite(float(m_h["loss"]))

    # Ground truth: single-device steps on each replica's full graph, with
    # the graph-count-weighted gradient combination -> since both replicas
    # have the same num_graphs, this equals the mean of per-replica grads.
    # Simpler equivalent check: loss must equal the graph-weighted mean of
    # per-replica single-device losses.
    from tf2_gnn_tpu.data.graph_batch import pad_node_label_array

    local_step = make_train_step(model, optimizer)
    total_loss, total_g = 0.0, 0.0
    for nf, adj, n2g, g, labels_np in singles:
        single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
        single_labels = {
            "node_labels": pad_node_label_array(labels_np, single.num_nodes_padded)
        }
        state_s = create_train_state(model, single, optimizer, seed=0)
        _, m_s = local_step(state_s, single, single_labels)
        total_loss += float(m_s["loss"]) * g
        total_g += g
    np.testing.assert_allclose(float(m_h["loss"]), total_loss / total_g,
                               rtol=1e-4)


@pytest.mark.parametrize(
    "flavour", ["rgcn", "ggnn", "rgin", "rgat", "gnn_edge_mlp", "gnn_film"]
)
def test_spmd_fused_pallas_matches_single_device(flavour):
    """Node-partitioned execution WITH the fused Pallas kernels: per-shard
    scatter plans + all_gather-ed global tables reproduce the single-device
    forward exactly."""
    nf, adj, n2g, g = _giant_graph(num_nodes=200, seed=11)
    params = _model_params(NodeMulticlassTask, flavour)
    model = NodeMulticlassTask.from_params(params)

    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    mesh = make_mesh(axis_name="nodes")
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4,
                                 build_scatter_plans=True)
    assert sharded.scatter_plans is not None
    (spmd_logits,) = make_spmd_forward(model, mesh)(variables["params"], sharded)
    spmd_flat = restore_node_order(spmd_logits, sharded)
    np.testing.assert_allclose(
        np.asarray(ref_logits)[: nf.shape[0]], spmd_flat[: nf.shape[0]],
        rtol=2e-4, atol=2e-4,
    )


def test_spmd_fused_train_step_matches_single_device():
    nf, adj, n2g, g = _giant_graph(num_nodes=200, seed=13)
    labels_np = (np.random.RandomState(2).rand(nf.shape[0], 121) > 0.9).astype(
        np.float32
    )
    params = _model_params(NodeMulticlassTask, "rgcn")
    params.update({"optimizer": "SGD", "momentum": 0.0, "learning_rate": 0.05})
    model = NodeMulticlassTask.from_params(params)
    optimizer = make_optimizer(params)

    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    from tf2_gnn_tpu.data.graph_batch import pad_node_label_array

    single_labels = {
        "node_labels": pad_node_label_array(labels_np, single.num_nodes_padded)
    }
    state_a = create_train_state(model, single, optimizer, seed=0)
    state_a, m_a = make_train_step(model, optimizer)(state_a, single,
                                                     single_labels)

    mesh = make_mesh(axis_name="nodes")
    sharded, sharded_labels = partition_graph(
        nf, adj, n2g, g, NUM_SHARDS, num_graphs_padded=4,
        node_labels={"node_labels": labels_np}, build_scatter_plans=True,
    )
    state_b = create_train_state(model, single, optimizer, seed=0)
    state_b, m_b = make_spmd_train_step(model, optimizer, mesh)(
        state_b, sharded, sharded_labels
    )
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-3,
                                   atol=5e-4)


@pytest.mark.parametrize(
    "flavour,merge,halo_form",
    [("rgcn", False, "dense"), ("rgcn", False, "ring"),
     ("ggnn", False, "dense"), ("rgin", False, "dense"),
     ("gnn_edge_mlp", True, "dense"), ("gnn_film", True, "ring"),
     ("gnn_edge_mlp_1hidden", True, "dense"),
     ("gnn_edge_mlp_1hidden", True, "ring"),
     ("rgat", False, "dense"), ("rgat", False, "ring")],
)
def test_spmd_pair_path_matches_single_device(flavour, merge, halo_form):
    extra = {}
    if flavour == "gnn_edge_mlp":
        extra = {"gnn_num_edge_MLP_hidden_layers": 0}
    elif flavour == "gnn_edge_mlp_1hidden":
        # The round-4 dedicated pair kernel for the reference-DEFAULT
        # config (target state + 1 hidden layer) composed with SPMD-halo:
        # per-shard merged plans over the ext source row space, the dA
        # pass scattering into ext rows.
        flavour, extra = "gnn_edge_mlp", {"gnn_num_edge_MLP_hidden_layers": 1}
    _run_spmd_pair_case(flavour, merge, halo_form, extra)


def _run_spmd_pair_case(flavour, merge, halo_form, extra):
    """Node-partitioned execution on the BLOCK-PAIR kernels: per-shard pair
    plans over the ext halo row space route every shard through the same
    gather-free fast path as single-chip (VERDICT r2 item 1). The patch
    counter proves the pair kernel actually runs — a silent fallback to the
    sorted-scatter path would still be numerically correct."""
    from unittest import mock

    import tf2_gnn_tpu.ops.pair_attention as pa
    import tf2_gnn_tpu.ops.pair_spmm as ps

    nf, adj, n2g, g = _giant_graph(num_nodes=200, seed=21)
    params = _model_params(NodeMulticlassTask, flavour, **extra)
    model = NodeMulticlassTask.from_params(params)

    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    mesh = make_mesh(axis_name="nodes")
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4, halo=halo_form,
                                 build_pair_plans=True,
                                 pair_merge_targets=merge)
    assert sharded.pair_plans is not None and sharded.halo_mode
    assert sharded.pair_targets_merged == merge
    # Plan arrays are stacked on the mesh axis (one slice per shard).
    assert all(p.shape[0] == NUM_SHARDS for p in sharded.pair_plans)

    calls = []
    if flavour == "rgat":
        target_mod, target_name = pa, "pair_attention"
    elif extra.get("gnn_num_edge_MLP_hidden_layers") == 1:
        import tf2_gnn_tpu.ops.pair_edge_mlp as pem

        target_mod, target_name = pem, "pair_relu_mlp_aggregate"
    else:
        target_mod, target_name = ps, "pair_typed_gather_scatter"
    orig = getattr(target_mod, target_name)

    def counted(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    with mock.patch.object(target_mod, target_name, counted):
        (spmd_logits,) = make_spmd_forward(model, mesh)(variables["params"],
                                                        sharded)
    assert calls, f"{flavour}: pair kernel never ran under SPMD"
    spmd_flat = restore_node_order(spmd_logits, sharded)
    np.testing.assert_allclose(
        np.asarray(ref_logits)[: nf.shape[0]], spmd_flat[: nf.shape[0]],
        rtol=2e-4, atol=2e-4,
    )


def test_spmd_pair_train_step_matches_single_device():
    """Gradients through the pair kernels' custom VJPs compose with the halo
    collective transpose: one SGD step on the pair-SPMD path lands on the
    same parameters as the single-device step."""
    nf, adj, n2g, g = _giant_graph(num_nodes=200, seed=13)
    labels_np = (np.random.RandomState(2).rand(nf.shape[0], 121) > 0.9).astype(
        np.float32
    )
    params = _model_params(NodeMulticlassTask, "rgcn")
    params.update({"optimizer": "SGD", "momentum": 0.0, "learning_rate": 0.05})
    model = NodeMulticlassTask.from_params(params)
    optimizer = make_optimizer(params)

    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    from tf2_gnn_tpu.data.graph_batch import pad_node_label_array

    single_labels = {
        "node_labels": pad_node_label_array(labels_np, single.num_nodes_padded)
    }
    state_a = create_train_state(model, single, optimizer, seed=0)
    state_a, m_a = make_train_step(model, optimizer)(state_a, single,
                                                     single_labels)

    mesh = make_mesh(axis_name="nodes")
    sharded, sharded_labels = partition_graph(
        nf, adj, n2g, g, NUM_SHARDS, num_graphs_padded=4,
        node_labels={"node_labels": labels_np}, build_pair_plans=True,
    )
    assert sharded.pair_plans is not None
    state_b = create_train_state(model, single, optimizer, seed=0)
    state_b, m_b = make_spmd_train_step(model, optimizer, mesh)(
        state_b, sharded, sharded_labels
    )
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-3,
                                   atol=5e-4)


@pytest.mark.parametrize("flavour", ["rgcn", "rgat"])
def test_spmd_legacy_allgather_matches_single_device(flavour):
    """halo=False keeps the round-1 global-source + per-layer all_gather
    path working (comparison baseline for the halo exchange)."""
    nf, adj, n2g, g = _giant_graph(seed=17)
    params = _model_params(NodeMulticlassTask, flavour)
    model = NodeMulticlassTask.from_params(params)

    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    mesh = make_mesh(axis_name="nodes")
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4, halo=False)
    assert sharded.halo_send_idx is None
    (spmd_logits,) = make_spmd_forward(model, mesh)(variables["params"],
                                                    sharded)
    spmd_flat = restore_node_order(spmd_logits, sharded)
    np.testing.assert_allclose(
        np.asarray(ref_logits)[: nf.shape[0]], spmd_flat[: nf.shape[0]],
        rtol=2e-4, atol=2e-5,
    )


def test_halo_plan_structure_and_bytes():
    """The halo plan references exactly the boundary rows each shard's edges
    need, and the per-layer exchange volume is bounded by the boundary size
    (not S * V like the legacy all_gather)."""
    # A graph with locality (edges stay within +-4 rows): the boundary is a
    # small fraction of V, which is where halo beats all_gather. (A fully
    # random graph has boundary ~ V and the two tie.)
    rng = np.random.RandomState(23)
    num_nodes = 256
    nf = rng.randn(num_nodes, 12).astype(np.float32)
    tgt = rng.randint(0, num_nodes, 600)
    src = np.clip(tgt + rng.randint(-4, 5, 600), 0, num_nodes - 1)
    adj = [np.stack([src[:300], tgt[:300]], axis=1).astype(np.int32),
           np.stack([src[300:], tgt[300:]], axis=1).astype(np.int32)]
    n2g = np.sort(rng.randint(0, 3, num_nodes)).astype(np.int32)
    g = 3
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4, halo="dense",
                                 reorder=False)
    assert sharded.halo_send_idx is not None
    s_mesh, s_dest, max_send = sharded.halo_send_idx.shape
    assert s_mesh == s_dest == NUM_SHARDS
    vp = sharded.node_features.shape[1]
    # Ext sources stay inside the ext row space.
    for t in range(sharded.num_edge_types):
        assert sharded.edge_sources[t].max() < sharded.halo_ext_nodes
    # Send lists index local rows only.
    assert sharded.halo_send_idx.max() < vp
    # Exchange bytes (per shard per layer) vs the legacy all_gather.
    d = nf.shape[1]
    halo_bytes = NUM_SHARDS * max_send * d * 4
    allgather_bytes = NUM_SHARDS * vp * d * 4
    assert halo_bytes < allgather_bytes
    # The auto heuristic picks the ring form here (local connectivity) and
    # its per-DISTANCE padding moves strictly fewer rows than the dense
    # per-pair padding.
    ring, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                              num_graphs_padded=4, reorder=False)
    assert ring.halo_ring_send is not None
    ring_rows = sum(idx.shape[1] for idx in ring.halo_ring_send)
    assert ring_rows < NUM_SHARDS * max_send
    for idx in ring.halo_ring_send:
        assert idx.shape[0] == NUM_SHARDS and idx.max() < vp


def test_zero_boundary_partition_emits_no_halo_collective():
    """Edges that never cross shard boundaries (e.g. whole graphs per
    shard) plan an EMPTY ring — no collective at all — and still match the
    single-device forward."""
    rng = np.random.RandomState(13)
    v = 96
    nodes = np.arange(v)
    # Self-loop-only connectivity: strictly shard-local for any sharding.
    adj = [np.stack([nodes, nodes], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)
    sharded, _ = partition_graph(nf, adj, n2g, 1, NUM_SHARDS,
                                 num_graphs_padded=2)
    assert sharded.halo_ring_send is not None
    assert sharded.halo_ring_dists == ()

    params = _model_params(NodeMulticlassTask, "rgcn")
    model = NodeMulticlassTask.from_params(params)
    single = _single_device_batch(nf, adj, n2g, 1, num_graphs_padded=2)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)
    mesh = make_mesh(axis_name="nodes")
    (spmd_logits,) = make_spmd_forward(model, mesh)(variables["params"],
                                                    sharded)
    spmd_flat = restore_node_order(spmd_logits, sharded)
    np.testing.assert_allclose(np.asarray(ref_logits)[:v], spmd_flat[:v],
                               rtol=2e-4, atol=2e-5)


def test_pair_group_choice_uses_busiest_shard():
    """Skewed partition (VERDICT r3 item 7): grid-group sizes must come from
    the MOST EXPENSIVE shard's run statistics, not shard 0's — a sparse
    shard 0 choosing groups for a dense shard could inflate every other
    shard's stacked plans. Shard 0 here is near-empty (self-loops only);
    the last shard carries a dense PPI-like block."""
    from unittest import mock

    import tf2_gnn_tpu.ops.pair_spmm as ps

    rng = np.random.RandomState(4)
    v = 256
    per_shard = v // NUM_SHARDS
    lo = np.arange(per_shard)  # shard 0's nodes: sparse
    hi = rng.randint(v - per_shard, v, 4000)  # last shard's targets: dense
    adj = [np.concatenate([
        np.stack([lo, lo], 1),
        np.stack([rng.randint(0, v, 4000), hi], 1),
    ]).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)

    seen = []
    orig = ps.choose_pair_groups

    def recording(sources, targets, counts, *args, **kwargs):
        seen.append(sum(int(c) for c in counts))
        return orig(sources, targets, counts, *args, **kwargs)

    with mock.patch.object(ps, "choose_pair_groups", recording):
        sharded, _ = partition_graph(nf, adj, n2g, 1, NUM_SHARDS,
                                     num_graphs_padded=2,
                                     build_pair_plans=True)
    assert sharded.pair_plans is not None
    # The shard whose edges were measured is the busiest one (the dense
    # block lands ~4000 + a few self-loop edges on the last shard).
    assert len(seen) == 1 and seen[0] >= 4000


def test_hybrid_stack_rejects_mismatched_replicas_clearly():
    """Replicas whose partitioning produced different static structure
    (here: auto-reorder engaging on a shuffled replica but not on a
    zero-boundary one) must fail with a message naming the fix, not a
    cryptic pytree mismatch."""
    from tf2_gnn_tpu.parallel import stack_partitioned_batches

    rng = np.random.RandomState(3)
    v = 64
    nodes = np.arange(v)
    # Replica A: self-loops only (auto-reorder declines).
    adj_a = [np.stack([nodes, nodes], 1).astype(np.int32)]
    # Replica B: shuffled ring-local (auto-reorder engages -> node_restore
    # leaf exists only here).
    src = np.clip(nodes.repeat(4) + rng.randint(-2, 3, v * 4), 0, v - 1)
    tgt = np.clip(nodes.repeat(4) + rng.randint(-2, 3, v * 4), 0, v - 1)
    shuf = rng.permutation(v)
    adj_b = [np.stack([shuf[src], shuf[tgt]], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)

    reps = [partition_graph(nf, adj, n2g, 1, 4, num_graphs_padded=2)
            for adj in (adj_a, adj_b)]
    assert reps[0][0].node_restore is None
    assert reps[1][0].node_restore is not None
    with pytest.raises(ValueError, match="reorder=False"):
        stack_partitioned_batches([b for b, _ in reps],
                                  [l for _, l in reps])


def test_hybrid_stack_rejects_mismatched_leaf_shapes():
    """Same pytree structure but diverging leaf SHAPES (replica graphs of
    different size) must fail with the mismatching field path, not a
    generic np.stack error (advisor r4)."""
    from tf2_gnn_tpu.parallel import stack_partitioned_batches

    rng = np.random.RandomState(4)
    reps = []
    v = 64
    nodes = np.arange(v)
    adj = [np.stack([nodes, nodes], 1).astype(np.int32)]
    n2g = np.zeros((v,), np.int32)
    for feat_dim in (6, 8):
        nf = rng.randn(v, feat_dim).astype(np.float32)
        reps.append(partition_graph(nf, adj, n2g, 1, 4, num_graphs_padded=2,
                                    reorder=False))
    with pytest.raises(ValueError, match="node_features"):
        stack_partitioned_batches([b for b, _ in reps],
                                  [l for _, l in reps])


@pytest.mark.parametrize("halo_form", ["dense", "ring"])
def test_spmd_typed_pair_path_matches_single_device(halo_form):
    """Round 5: per-TYPE row-split plans per shard ride the single-launch
    streamed kernel under SPMD (ext src_space slices, full-width
    single-sweep residency) — the form the shipped PPI_RGCN config uses
    single-chip. The patch counter proves the streamed path runs."""
    from unittest import mock

    import tf2_gnn_tpu.ops.pair_spmm as ps

    nf, adj, n2g, g = _giant_graph(num_nodes=200, seed=29)
    params = _model_params(NodeMulticlassTask, "rgcn")
    model = NodeMulticlassTask.from_params(params)

    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    mesh = make_mesh(axis_name="nodes")
    sharded, _ = partition_graph(nf, adj, n2g, g, NUM_SHARDS,
                                 num_graphs_padded=4, halo=halo_form,
                                 build_pair_plans=True, pair_per_type=True)
    assert sharded.pair_plans is None
    assert sharded.pair_plans_typed is not None and sharded.halo_mode
    for typed in sharded.pair_plans_typed:
        assert all(p.shape[0] == NUM_SHARDS for p in typed)

    calls = []
    orig = ps.pair_stream_joint_from_typed

    def counted(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    with mock.patch.object(ps, "pair_stream_joint_from_typed", counted):
        (spmd_logits,) = make_spmd_forward(model, mesh)(variables["params"],
                                                        sharded)
    assert calls, "joint streamed typed kernel never ran under SPMD"
    spmd_flat = restore_node_order(spmd_logits, sharded)
    np.testing.assert_allclose(
        np.asarray(ref_logits)[: nf.shape[0]], spmd_flat[: nf.shape[0]],
        rtol=2e-4, atol=2e-4,
    )


def test_hybrid_mesh_runs_typed_pair_replicas():
    """2-D (data x nodes) mesh with replicas whose node partitions carry
    per-TYPE pair plans — the round-5 shipped plan form composed with the
    hybrid scheme. Pinned partitioner choices keep replica structure
    uniform; the step must run and produce a finite loss."""
    from tf2_gnn_tpu.harness.optimizers import make_optimizer
    from tf2_gnn_tpu.harness.training import create_train_state
    from tf2_gnn_tpu.parallel import (
        make_hybrid_mesh,
        make_hybrid_train_step,
        stack_partitioned_batches,
    )
    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask

    rng = np.random.RandomState(6)
    v = 256
    nodes = np.arange(v)
    params = _model_params(NodeMulticlassTask, "rgcn")
    model = NodeMulticlassTask.from_params(params)
    reps = []
    for r in range(2):
        src = np.clip(nodes.repeat(3) + rng.randint(-4, 5, v * 3), 0, v - 1)
        tgt = np.clip(nodes.repeat(3) + rng.randint(-4, 5, v * 3), 0, v - 1)
        adj = [np.stack([src, tgt], 1).astype(np.int32)]
        nf = rng.randn(v, 6).astype(np.float32)
        n2g = np.zeros((v,), np.int32)
        labels = {"node_labels": (rng.rand(v, 121) > 0.9).astype(np.float32)}
        reps.append(partition_graph(
            nf, adj, n2g, 1, 4, num_graphs_padded=2, node_labels=labels,
            build_pair_plans=True, pair_per_type=True, halo="ring",
            reorder=False))
    for b, _ in reps:
        assert b.pair_plans_typed is not None
    batch2d, labels2d = stack_partitioned_batches(
        [b for b, _ in reps], [l for _, l in reps])
    mesh = make_hybrid_mesh(2, 4)
    template = jax.tree.map(lambda x: x[0][0], batch2d).replace(
        spmd_axis=None)
    optimizer = make_optimizer(params)
    state = create_train_state(model, template, optimizer, seed=0)
    step = make_hybrid_train_step(model, optimizer, mesh)
    _, metrics = step(state, batch2d, labels2d)
    assert np.isfinite(float(metrics["loss"]))
