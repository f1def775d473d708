"""Dataset loading + padded batching over synthetic fixture files.

Mirrors the reference's test/data/test_datasets.py: per-loader edge-type
counts, feature shapes, sample counts, batch contents, self-loop placement and
backward-edge tying — adapted to the padded static-shape batch contract.
"""
import numpy as np
import pytest

from tf2_gnn_tpu.data.graph_dataset import DataFold
from tf2_gnn_tpu.data.jsonl_property_dataset import JsonLGraphPropertyDataset
from tf2_gnn_tpu.data.ppi_dataset import PPIDataset
from tf2_gnn_tpu.data.qm9_dataset import QM9Dataset

from .synthetic_data import (
    write_jsonl_property_dataset,
    write_ppi_dataset,
    write_qm9_dataset,
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    return write_jsonl_property_dataset(tmp_path, num_fwd_edge_types=1)


@pytest.fixture()
def qm9_dir(tmp_path):
    return write_qm9_dataset(tmp_path)


@pytest.fixture()
def ppi_dir(tmp_path):
    return write_ppi_dataset(tmp_path / "ppi")


def test_jsonl_property_dataset_loads(jsonl_dir):
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 30})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir, {DataFold.TRAIN, DataFold.VALIDATION})
    # tied bkwd + self loops: 1 fwd type -> 2 total.
    assert ds.num_edge_types == 2
    assert ds.node_feature_shape == (7,)
    assert len(ds._graphs_in_fold(DataFold.TRAIN)) == 12

    batches = list(ds.batch_iterator(DataFold.TRAIN))
    assert batches
    for batch, labels in batches:
        assert batch.node_features.shape == (30, 7)
        assert batch.num_edge_types == 2
        assert "target_value" in labels
        assert labels["target_value"].shape == (batch.num_graphs_padded,)
        # Real-node rows of node_to_graph are within real graph count.
        n_real = int(batch.num_nodes)
        assert np.all(np.asarray(batch.node_to_graph)[:n_real] < int(batch.num_graphs))
        # Pad rows map to the pad graph slot.
        assert np.all(
            np.asarray(batch.node_to_graph)[n_real:] == batch.num_graphs_padded - 1
        )


def test_jsonl_self_loops_first_type(jsonl_dir):
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 30})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir, {DataFold.VALIDATION})
    sample = ds._graphs_in_fold(DataFold.VALIDATION)[0]
    # Self loops are inserted at type 0 by default: [i, i] for every node.
    loops = sample.adjacency_lists[0]
    np.testing.assert_array_equal(loops[:, 0], loops[:, 1])
    assert loops.shape[0] == sample.num_nodes


def test_jsonl_untied_backward_edges(jsonl_dir):
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update(
        {
            "num_fwd_edge_types": 1,
            "tie_fwd_bkwd_edges": False,
            "add_self_loop_edges": False,
            "max_nodes_per_batch": 30,
        }
    )
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir, {DataFold.VALIDATION})
    assert ds.num_edge_types == 2
    sample = ds._graphs_in_fold(DataFold.VALIDATION)[0]
    fwd, bkwd = sample.adjacency_lists
    np.testing.assert_array_equal(fwd[:, 0], bkwd[:, 1])
    np.testing.assert_array_equal(fwd[:, 1], bkwd[:, 0])


def test_threshold_binarisation(jsonl_dir):
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update(
        {"num_fwd_edge_types": 1, "threshold_for_classification": 0.0,
         "max_nodes_per_batch": 30}
    )
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir, {DataFold.VALIDATION})
    targets = [g.target_value for g in ds._graphs_in_fold(DataFold.VALIDATION)]
    assert set(targets) <= {0.0, 1.0}


def test_qm9_dataset_loads(qm9_dir):
    params = QM9Dataset.get_default_hyperparameters()
    params.update({"max_nodes_per_batch": 30})
    ds = QM9Dataset(params)
    ds.load_data(qm9_dir, {DataFold.TRAIN})
    # 4 fwd, all tied, + self loops = 5.
    assert ds.num_edge_types == 5
    assert ds.node_feature_shape == (6,)
    batch, labels = next(ds.batch_iterator(DataFold.TRAIN))
    assert batch.num_edge_types == 5
    assert labels["target_value"].shape == (batch.num_graphs_padded,)


def test_ppi_dataset_loads(ppi_dir):
    params = PPIDataset.get_default_hyperparameters()
    params.update({"max_nodes_per_batch": 64})
    ds = PPIDataset(params)
    ds.load_data(ppi_dir, {DataFold.TRAIN, DataFold.VALIDATION})
    # 1 fwd untied + self loops = 3 (self loop type 0, fwd 1, bkwd 2).
    assert ds.num_edge_types == 3
    assert ds.num_node_target_labels == 121
    assert len(ds._graphs_in_fold(DataFold.TRAIN)) == 2

    batch, labels = next(ds.batch_iterator(DataFold.TRAIN))
    assert labels["node_labels"].shape == (64, 121)
    # Pad-node labels are zero.
    n_real = int(batch.num_nodes)
    np.testing.assert_array_equal(labels["node_labels"][n_real:], 0.0)


def test_packing_respects_budgets(jsonl_dir):
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 20})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir, {DataFold.TRAIN})
    config = ds.padding_config
    for batch, _ in ds.batch_iterator(DataFold.TRAIN):
        assert int(batch.num_nodes) <= config.num_nodes - 1
        assert int(batch.num_graphs) <= config.num_graphs - 1
        for t in range(batch.num_edge_types):
            assert int(np.asarray(batch.num_edges)[t]) <= config.edge_budgets[t]


def test_all_batches_share_static_shapes(jsonl_dir):
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 20})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir, {DataFold.TRAIN})
    shapes = set()
    for batch, _ in ds.batch_iterator(DataFold.TRAIN):
        shapes.add(
            (batch.node_features.shape,
             tuple(s.shape for s in batch.edge_sources),
             batch.num_graphs_padded)
        )
    assert len(shapes) == 1  # exactly one XLA program per fold


def test_eval_batches_cached_across_epochs(jsonl_dir):
    """Non-TRAIN folds replay their first epoch's finalised batches
    (packing + host plan building run ONCE); TRAIN reshuffles and is never
    cached; reloading a fold invalidates its cache (VERDICT r3 item 4)."""
    from unittest import mock

    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 30})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir)

    finalise = type(ds)._finalise_batch
    with mock.patch.object(type(ds), "_finalise_batch",
                           autospec=True, side_effect=finalise) as m:
        first = list(ds.batch_iterator(DataFold.VALIDATION))
        packs_first = m.call_count
        assert packs_first == len(first) > 0
        second = list(ds.batch_iterator(DataFold.VALIDATION))
        assert m.call_count == packs_first  # replayed, not re-packed
        for (b1, l1), (b2, l2) in zip(first, second):
            np.testing.assert_array_equal(np.asarray(b1.node_features),
                                          np.asarray(b2.node_features))
            for k in l1:
                np.testing.assert_array_equal(l1[k], l2[k])

        list(ds.batch_iterator(DataFold.TRAIN))
        train_packs = m.call_count - packs_first
        list(ds.batch_iterator(DataFold.TRAIN))
        assert m.call_count == packs_first + 2 * train_packs  # no caching

    # Reloading a fold drops its cached batches.
    ds.load_data_from_list(
        [{"graph": {"node_features": [[0.0] * 50] * 3,
                    "adjacency_lists": [[[0, 1], [1, 2]]]},
          "Property": 1.0}],
        DataFold.VALIDATION,
    )
    with mock.patch.object(type(ds), "_finalise_batch",
                           autospec=True, side_effect=finalise) as m:
        list(ds.batch_iterator(DataFold.VALIDATION))
        assert m.call_count > 0


def test_set_padding_config_invalidates_batch_cache(jsonl_dir):
    """Cached eval batches embed their padding config; pinning a new config
    must drop them through the _invalidate_batches choke point (advisor
    r4)."""
    from tf2_gnn_tpu.data.graph_batch import PaddingConfig

    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 30})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir)
    first = list(ds.batch_iterator(DataFold.VALIDATION))
    assert DataFold.VALIDATION in ds._batch_cache

    old = ds.padding_config
    ds.set_padding_config(PaddingConfig(
        num_nodes=old.num_nodes + 64,
        num_graphs=old.num_graphs,
        edge_budgets=old.edge_budgets,
    ))
    assert ds._batch_cache == {}
    second = list(ds.batch_iterator(DataFold.VALIDATION))
    assert second[0][0].node_features.shape[0] == old.num_nodes + 64
    assert first[0][0].node_features.shape[0] == old.num_nodes


def test_cache_train_batches_opt_in(jsonl_dir):
    """cache_train_batches replays the first train epoch's finalised
    batches (host packing/planning runs once — frozen shuffle order,
    documented deviation); the default keeps re-packing every epoch."""
    from unittest import mock

    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 30,
                   "cache_train_batches": True})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(jsonl_dir)

    finalise = type(ds)._finalise_batch
    with mock.patch.object(type(ds), "_finalise_batch",
                           autospec=True, side_effect=finalise) as m:
        first = list(ds.batch_iterator(DataFold.TRAIN))
        packs = m.call_count
        assert packs == len(first) > 0
        second = list(ds.batch_iterator(DataFold.TRAIN))
        assert m.call_count == packs  # replayed
    for (b1, _), (b2, _) in zip(first, second):
        np.testing.assert_array_equal(np.asarray(b1.node_features),
                                      np.asarray(b2.node_features))
