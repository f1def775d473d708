"""Harness: config merge, task registry, checkpoint save/load, CLI end-to-end.

Mirrors the reference's save/load round-trip test
(test/models/test_graph_regression_task.py:49-90) plus the config precedence
rules (SURVEY.md §5.6).
"""
import json

import jax
import numpy as np
import pytest

from tf2_gnn_tpu.data.graph_dataset import DataFold
from tf2_gnn_tpu.data.jsonl_property_dataset import JsonLGraphPropertyDataset
from tf2_gnn_tpu.harness import (
    apply_hyperdrive_overrides,
    build_training,
    get_known_tasks,
    load_checkpoint_metadata,
    load_default_hypers,
    load_weights_verbosely,
    merge_params,
    restore_dataset,
    restore_model_and_params,
    save_model,
    task_name_to_dataset_class,
    task_name_to_model_class,
)
from tf2_gnn_tpu.harness.config import coerce_hyperdrive_value
from tf2_gnn_tpu.models.graph_regression_task import GraphRegressionTask

from .synthetic_data import write_jsonl_property_dataset


def test_task_registry_builtins():
    tasks = {t.lower() for t in get_known_tasks()}
    assert {"ppi", "qm9", "graphregression", "graphbinaryclassification"} <= tasks
    ds_cls, ds_hypers = task_name_to_dataset_class("GraphBinaryClassification")
    assert ds_cls is JsonLGraphPropertyDataset
    assert ds_hypers["threshold_for_classification"] == 23.0
    model_cls, _ = task_name_to_model_class("ppi")
    assert model_cls.__name__ == "NodeMulticlassTask"


def test_default_hypers_shipped_for_all_reference_pairs():
    for task, mp in [
        ("PPI", "RGCN"), ("PPI", "GGNN"), ("PPI", "RGAT"), ("PPI", "RGIN"),
        ("PPI", "GNN_Edge_MLP"), ("PPI", "GNN_FiLM"),
        ("QM9", "RGCN"), ("GraphRegression", "GNN_Edge_MLP"),
    ]:
        hypers = load_default_hypers(task, mp)
        assert hypers["model_params"], (task, mp)
        assert "max_nodes_per_batch" in hypers["task_params"], (task, mp)
    assert load_default_hypers("Nope", "RGCN") == {
        "task_params": {}, "model_params": {},
    }


def test_merge_precedence_and_hyperdrive_coercion():
    merged = merge_params({"a": 1, "b": 2}, None, {"b": 3}, {"c": 4})
    assert merged == {"a": 1, "b": 3, "c": 4}

    assert coerce_hyperdrive_value(True, "false") is False
    assert coerce_hyperdrive_value(5, "7") == 7
    assert coerce_hyperdrive_value(5, "7.9") == 7
    assert coerce_hyperdrive_value(0.5, "0.25") == 0.25
    assert coerce_hyperdrive_value([1, 2], "[3, 4]") == [3, 4]
    assert coerce_hyperdrive_value("x", "y") == "y"

    params = apply_hyperdrive_overrides(
        {"learning_rate": 0.001, "gnn_num_layers": 4, "unused": 1},
        {"learning_rate": "0.01", "gnn_num_layers": "8", "not_a_param": "9"},
    )
    assert params["learning_rate"] == 0.01
    assert params["gnn_num_layers"] == 8
    assert "not_a_param" not in params


def _trained_setup(tmp_path):
    write_jsonl_property_dataset(tmp_path)
    ds_params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    ds_params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 40})
    ds = JsonLGraphPropertyDataset(ds_params)
    ds.load_data(tmp_path, {DataFold.TRAIN, DataFold.VALIDATION})

    params = GraphRegressionTask.get_default_hyperparameters("rgcn")
    params.update({"gnn_hidden_dim": 8, "gnn_num_layers": 2})
    model = GraphRegressionTask.from_params(params, ds)
    batch, labels = next(ds.batch_iterator(DataFold.TRAIN))
    state, train_step, eval_step = build_training(model, params, batch)
    return ds, model, params, state, batch


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    ds, model, params, state, batch = _trained_setup(tmp_path / "data")
    ckpt = tmp_path / "model_best.pkl"
    save_model(ckpt, model, params, ds, state.params)

    checkpoint = load_checkpoint_metadata(ckpt)
    ds2 = restore_dataset(checkpoint)
    assert ds2.num_edge_types == ds.num_edge_types
    assert ds2.padding_config == ds.padding_config
    model2, params2 = restore_model_and_params(checkpoint, ds2)
    assert params2 == params

    variables = model2.init(jax.random.PRNGKey(123), batch, False)
    restored = load_weights_verbosely(checkpoint, variables["params"],
                                      log=lambda *_: None)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Predictions identical across "sessions".
    out_a = model.apply({"params": state.params}, batch, False)
    out_b = model2.apply({"params": restored}, batch, False)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_partial_restore_warns_and_keeps_fresh(tmp_path):
    ds, model, params, state, batch = _trained_setup(tmp_path / "data")
    ckpt = tmp_path / "model_best.pkl"
    save_model(ckpt, model, params, ds, state.params)
    checkpoint = load_checkpoint_metadata(ckpt)

    # A different architecture: more layers -> extra fresh params.
    params_big = dict(params)
    params_big["gnn_num_layers"] = 3
    model_big = GraphRegressionTask.from_params(params_big, ds)
    variables = model_big.init(jax.random.PRNGKey(3), batch, False)
    warnings = []
    restored = load_weights_verbosely(checkpoint, variables["params"],
                                      log=warnings.append)
    assert any("not found in checkpoint" in w for w in warnings)
    # Shared layers restored exactly.
    np.testing.assert_array_equal(
        np.asarray(restored["gnn"]["mp_layer_0"]["edge_mlp_layer_0"]["kernel"]),
        np.asarray(state.params["gnn"]["mp_layer_0"]["edge_mlp_layer_0"]["kernel"]),
    )


def test_cli_train_and_test_end_to_end(tmp_path, capsys):
    """Full CLI path: train 2 epochs on synthetic data, then test."""
    data_dir = tmp_path / "data"
    write_jsonl_property_dataset(data_dir)

    from tf2_gnn_tpu.harness.run import (
        get_train_cli_arg_parser,
        parse_hyperdrive_leftovers,
        run_train_from_args,
        test_model,
    )

    parser = get_train_cli_arg_parser()
    args, leftovers = parser.parse_known_args(
        [
            "RGCN", "GraphRegression", str(data_dir),
            "--save-dir", str(tmp_path / "runs"),
            "--max-epochs", "2",
            "--run-name", "cli_smoke",
            "--model-params-override",
            json.dumps({"gnn_hidden_dim": 8, "gnn_num_layers": 2}),
            "--data-params-override",
            json.dumps({"num_fwd_edge_types": 1, "max_nodes_per_batch": 40}),
            "--gnn_layer_input_dropout_rate", "0.0",
        ]
    )
    overrides = parse_hyperdrive_leftovers(leftovers)
    assert overrides == {"gnn_layer_input_dropout_rate": "0.0"}
    ckpt = run_train_from_args(args, overrides)
    assert ckpt.exists()
    assert (tmp_path / "runs" / "cli_smoke.log").exists()

    metric = test_model(ckpt, data_dir)
    assert np.isfinite(metric)


def test_predict_concatenates_real_rows(tmp_path):
    from tf2_gnn_tpu.harness.training import predict

    ds, model, params, state, batch = _trained_setup(tmp_path / "data")
    out = predict(model, state.params,
                  ds.batch_iterator(DataFold.VALIDATION))
    total_graphs = sum(
        int(np.asarray(b.num_graphs))
        for b, _ in ds.batch_iterator(DataFold.VALIDATION)
    )
    assert np.asarray(out).shape[0] == total_graphs


def test_gnn_input_library_embedding():
    from tf2_gnn_tpu.layers import GNN, GNNInput, batch_from_gnn_input

    rng = np.random.RandomState(0)
    gi = GNNInput(
        node_features=rng.randn(10, 6).astype(np.float32),
        adjacency_lists=[np.array([[0, 1], [2, 3], [4, 5]], dtype=np.int32)],
        node_to_graph_map=np.array([0] * 5 + [1] * 5, dtype=np.int32),
        num_graphs=2,
    )
    batch = batch_from_gnn_input(gi)
    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out, _ = gnn.apply(variables, batch, False)
    assert out.shape == (batch.num_nodes_padded, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_exact_resume_with_optimizer_state(tmp_path):
    from tf2_gnn_tpu.harness.checkpoint import restore_opt_state

    ds, model, params, state, batch = _trained_setup(tmp_path / "data")
    ckpt = tmp_path / "model_best.pkl"
    save_model(ckpt, model, params, ds, state.params,
               opt_state=state.opt_state, step=int(state.step))
    checkpoint = load_checkpoint_metadata(ckpt)
    assert checkpoint["step"] == int(state.step)
    restored = restore_opt_state(checkpoint, state.opt_state)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_ppi_shipped_config_end_to_end(tmp_path):
    """PPI task through the shipped PPI_RGCN config (Pallas path enabled)."""
    from .synthetic_data import write_ppi_dataset
    from tf2_gnn_tpu.harness.run import (
        get_train_cli_arg_parser,
        run_train_from_args,
        test_model,
    )

    data_dir = tmp_path / "ppi"
    write_ppi_dataset(data_dir)
    parser = get_train_cli_arg_parser()
    args, _ = parser.parse_known_args(
        [
            "RGCN", "PPI", str(data_dir),
            "--save-dir", str(tmp_path / "runs"),
            "--max-epochs", "1",
            "--run-name", "ppi_smoke",
            "--model-params-override",
            json.dumps({"gnn_hidden_dim": 8, "gnn_num_layers": 2}),
            "--data-params-override",
            json.dumps({"max_nodes_per_batch": 64}),
        ]
    )
    ckpt = run_train_from_args(args, {})
    assert ckpt.exists()
    metric = test_model(ckpt, data_dir)
    assert np.isfinite(metric)
    # The shipped config turned the pair-kernel plans on.
    import pickle

    with open(ckpt, "rb") as f:
        saved = pickle.load(f)
    assert saved["dataset_params"]["use_pair_spmm"] is True


def test_train_parser_accepts_reference_compat_flags():
    """The reference CLI's remaining flags parse (drop-in compatibility:
    cli_utils/training_utils.py:302-345)."""
    from tf2_gnn_tpu.harness.run import get_train_cli_arg_parser

    parser = get_train_cli_arg_parser()
    args = parser.parse_args(
        ["RGCN", "PPI", "/tmp/data",
         "--disable-tf-func", "--azure-info", "azure_auth.json",
         "--azureml_logging"]
    )
    assert args.disable_jit is True
    assert args.azure_info == "azure_auth.json"
    assert args.azureml_logging is True


def test_test_model_accepts_param_overrides(tmp_path):
    """tf2_gnn_tpu_test's --model/data-params-override flags reach
    restore_dataset/restore_model_and_params (reference cli/test.py:50-61)."""
    import json

    from tf2_gnn_tpu.harness.run import (
        get_train_cli_arg_parser,
        run_train_from_args,
        test_model,
    )

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_jsonl_property_dataset(data_dir)
    args = get_train_cli_arg_parser().parse_args(
        ["RGCN", "GraphRegression", str(data_dir),
         "--save-dir", str(tmp_path / "runs"), "--max-epochs", "1",
         "--model-params-override",
         json.dumps({"gnn_hidden_dim": 8, "gnn_num_layers": 2}),
         "--data-params-override", json.dumps({"max_nodes_per_batch": 64})]
    )
    ckpt = run_train_from_args(args, {})
    metric = test_model(
        ckpt, data_dir,
        data_params_override=json.dumps({"max_nodes_per_batch": 48}),
    )
    assert np.isfinite(metric)
