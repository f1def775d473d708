"""Data-parallel training over the 8-virtual-device CPU mesh.

Checks the DP semantics promise: a shard_map-ed step over N devices computes
exactly what one device would compute on the concatenated batches (gradients
and metrics are graph-count-weighted), and parameters stay replicated.
"""
import jax
import numpy as np

from tf2_gnn_tpu.data.graph_dataset import DataFold
from tf2_gnn_tpu.data.jsonl_property_dataset import JsonLGraphPropertyDataset
from tf2_gnn_tpu.harness.optimizers import make_optimizer
from tf2_gnn_tpu.harness.training import (
    create_train_state,
    make_train_step,
)
from tf2_gnn_tpu.models.graph_regression_task import GraphRegressionTask
from tf2_gnn_tpu.parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    shard_batches,
    stack_batches,
)

from .synthetic_data import write_jsonl_property_dataset


def _setup(tmp_path, num_graphs=24):
    write_jsonl_property_dataset(tmp_path, num_graphs=num_graphs)
    params_ds = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params_ds.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 24})
    ds = JsonLGraphPropertyDataset(params_ds)
    ds.load_data(tmp_path, {DataFold.TRAIN, DataFold.VALIDATION})

    params = GraphRegressionTask.get_default_hyperparameters("rgcn")
    params.update(
        {
            "gnn_hidden_dim": 8,
            "gnn_num_layers": 2,
            "learning_rate": 0.01,
            # Determinism for the DP == single-device equivalence checks.
            "graph_aggregation_dropout_rate": 0.0,
            "regression_mlp_dropout": 0.0,
        }
    )
    model = GraphRegressionTask.from_params(params, ds)
    return ds, model, params


def test_dp_runs_on_8_device_mesh(tmp_path):
    ds, model, params = _setup(tmp_path)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    optimizer = make_optimizer(params)
    example_batch, _ = next(ds.batch_iterator(DataFold.TRAIN))
    state = create_train_state(model, example_batch, optimizer, seed=0)
    train_step = make_dp_train_step(model, optimizer, mesh)
    eval_step = make_dp_eval_step(model, mesh)

    # 8 single-device batches -> one stacked DP step.
    batches = []
    while len(batches) < 8:
        batches.extend(ds.batch_iterator(DataFold.TRAIN))
    stacked_batch, stacked_labels = stack_batches(
        [b for b, _ in batches[:8]], [l for _, l in batches[:8]]
    )
    state, metrics = train_step(state, stacked_batch, stacked_labels)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["num_graphs"]) == sum(
        int(b.num_graphs) for b, _ in batches[:8]
    )
    eval_metrics = eval_step(state.params, stacked_batch, stacked_labels)
    assert np.isfinite(float(eval_metrics["loss"]))


def test_dp_eval_matches_single_device(tmp_path):
    """DP metrics == graph-weighted combination of per-batch single-device metrics."""
    ds, model, params = _setup(tmp_path)
    mesh = make_mesh()
    optimizer = make_optimizer(params)
    example_batch, _ = next(ds.batch_iterator(DataFold.TRAIN))
    state = create_train_state(model, example_batch, optimizer, seed=0)

    pairs = []
    while len(pairs) < 8:
        pairs.extend(ds.batch_iterator(DataFold.VALIDATION))
    pairs = pairs[:8]

    # Single-device reference values.
    from tf2_gnn_tpu.harness.training import make_eval_step

    single_eval = make_eval_step(model)
    total_loss, total_graphs = 0.0, 0.0
    for batch, labels in pairs:
        m = single_eval(state.params, batch, labels)
        g = float(np.asarray(batch.num_graphs))
        total_loss += float(m["loss"]) * g
        total_graphs += g

    stacked_batch, stacked_labels = stack_batches(
        [b for b, _ in pairs], [l for _, l in pairs]
    )
    dp_metrics = make_dp_eval_step(model, mesh)(
        state.params, stacked_batch, stacked_labels
    )
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), total_loss / total_graphs, rtol=1e-4
    )


def test_dp_grad_step_matches_single_device_on_replicated_data(tmp_path):
    """With identical batches on every device, one DP step == one local step."""
    ds, model, params = _setup(tmp_path)
    mesh = make_mesh()
    # SGD: the update is linear in the gradient, so parameter equality is a
    # direct gradient-equality check (Adam would amplify float noise where
    # gradients are ~0 via m/(sqrt(v)+eps)).
    params.update({"optimizer": "SGD", "momentum": 0.0})
    optimizer = make_optimizer(params)
    batch, labels = next(ds.batch_iterator(DataFold.VALIDATION))

    state_a = create_train_state(model, batch, optimizer, seed=0)
    state_b = create_train_state(model, batch, optimizer, seed=0)

    stacked_batch, stacked_labels = stack_batches([batch] * 8, [labels] * 8)
    dp_step = make_dp_train_step(model, optimizer, mesh)
    state_a, m_a = dp_step(state_a, stacked_batch, stacked_labels)

    # Local step without dropout influence: dropout rates are 0 here.
    local_step = make_train_step(model, optimizer)
    state_b, m_b = local_step(state_b, batch, labels)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for pa, pb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-4,
                                   atol=1e-6)


def test_shard_batches_grouping(tmp_path):
    ds, _, _ = _setup(tmp_path)
    groups = list(shard_batches(ds.batch_iterator(DataFold.TRAIN), 2))
    for stacked_batch, stacked_labels in groups:
        assert stacked_batch.node_features.shape[0] == 2
        assert stacked_labels["target_value"].shape[0] == 2
