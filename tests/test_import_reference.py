"""Reference hdf5 weight import: mapping + exact numerical parity.

A synthetic Keras-style weight file is generated in the reference's REAL
name-scope layout (verified against actual reference-produced checkpoints,
see tests/fixtures/reference_dumps and test_reference_parity.py), imported,
and the resulting RGCN forward pass is checked against a straight numpy
re-implementation of the reference's math — per-layer allclose, the parity
gate from BASELINE.md.
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax

from tf2_gnn_tpu.data.graph_batch import PaddingConfig, pad_batch_arrays
from tf2_gnn_tpu.harness.import_reference import (
    import_reference_weights,
    map_reference_variables,
    read_reference_checkpoint,
)
from tf2_gnn_tpu.layers.gnn import GNN


def _write_reference_style_h5(path, num_layers, num_types, d, h, rng):
    """Weights in the reference's name-scoped layout for an RGCN.

    Layout matches real ``save_model`` output (model_utils.py:62-71): a
    Keras-generated top group, then name-scoped variable paths.
    """
    values = {}
    with h5py.File(path, "w") as f:
        g = f.create_group("gnn")  # auto-generated first level (skipped on read)
        k = rng.randn(d, h).astype(np.float32) * 0.2
        g.create_dataset("RGCN_GNN/gnn_initial_node_projection/kernel:0", data=k)
        values["init"] = k
        for layer in range(num_layers):
            for t in range(num_types):
                k = rng.randn(h, h).astype(np.float32) * 0.2
                g.create_dataset(
                    f"RGCN_GNN/Layer_{layer}/MessagePassing/edge_type_{t}/"
                    f"MLP/dense_out/kernel:0",
                    data=k,
                )
                values[f"l{layer}t{t}"] = k
            if layer % 2 == 0:
                k = rng.randn(h, h).astype(np.float32) * 0.2
                g.create_dataset(f"RGCN_GNN/Layer_{layer}/Dense/kernel:0", data=k)
                values[f"dense{layer}"] = k
    return values


def test_import_maps_and_stacks(tmp_path):
    rng = np.random.RandomState(0)
    path = tmp_path / "ref.hdf5"
    values = _write_reference_style_h5(path, num_layers=2, num_types=3,
                                       d=6, h=8, rng=rng)
    h5_vars = read_reference_checkpoint(str(path))
    mapped, unmatched = map_reference_variables(h5_vars, log=lambda *_: None)
    assert not unmatched
    np.testing.assert_array_equal(
        mapped[("gnn", "initial_node_projection", "kernel")], values["init"]
    )
    stacked = mapped[("gnn", "mp_layer_1", "edge_mlp_layer_0", "kernel")]
    assert stacked.shape == (3, 8, 8)
    np.testing.assert_array_equal(stacked[2], values["l1t2"])
    np.testing.assert_array_equal(
        mapped[("gnn", "dense_0", "kernel")], values["dense0"]
    )


def test_imported_rgcn_matches_reference_math(tmp_path):
    """Forward with imported weights == hand-computed reference RGCN."""
    rng = np.random.RandomState(1)
    d, h, num_types, num_layers, n = 6, 8, 2, 2, 10
    path = tmp_path / "ref.hdf5"
    values = _write_reference_style_h5(path, num_layers, num_types, d, h, rng)

    # Graph: random edges per type.
    adjacency = [
        np.stack([rng.randint(0, n, 15), rng.randint(0, n, 15)], axis=1
                 ).astype(np.int32)
        for _ in range(num_types)
    ]
    feats = rng.randn(n, d).astype(np.float32)
    config = PaddingConfig(num_nodes=16, num_graphs=2, edge_budgets=(32, 32))
    batch = pad_batch_arrays(feats, adjacency, np.zeros(n, dtype=np.int32), 1,
                             config)

    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": h, "num_layers": num_layers,
               "dense_every_num_layers": 2, "residual_every_num_layers": 10000,
               "global_exchange_every_num_layers": 10000})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    params = import_reference_weights(
        {"gnn": variables["params"]}, str(path), log=lambda *_: None
    )["gnn"]
    out, _ = gnn.apply({"params": params}, batch, False)

    # Reference math in numpy (rgcn.py semantics: normalize by per-type
    # in-degree, sum aggregation, ReLU after; initial tanh projection;
    # dense+tanh at layer 0).
    cur = np.tanh(feats @ values["init"])
    for layer in range(num_layers):
        agg = np.zeros((n, h), dtype=np.float64)
        for t in range(num_types):
            deg = np.zeros(n)
            for s_, t_ in adjacency[t]:
                deg[t_] += 1
            msgs = cur @ values[f"l{layer}t{t}"]
            for s_, t_ in adjacency[t]:
                agg[t_] += msgs[s_] / (deg[t_] + 1e-7)
        cur = np.maximum(agg, 0.0)
        if layer % 2 == 0:
            cur = np.tanh(cur @ values[f"dense{layer}"])

    np.testing.assert_allclose(np.asarray(out)[:n], cur, rtol=1e-4, atol=1e-5)


def test_split_concat_kernel_for_target_state():
    rng = np.random.RandomState(2)
    k = rng.randn(12, 8).astype(np.float32)  # [2D=12, H=8]
    ref_vars = {
        "GNN_Edge_MLP_GNN/Layer_0/MessagePassing/edge_type_0/"
        "MLP/dense_out/kernel:0": k
    }
    mapped, unmatched = map_reference_variables(
        ref_vars, use_target_state_as_input=True, log=lambda *_: None
    )
    assert not unmatched
    np.testing.assert_array_equal(
        mapped[("gnn", "mp_layer_0", "edge_mlp_src_0", "kernel")][0], k[:6]
    )
    np.testing.assert_array_equal(
        mapped[("gnn", "mp_layer_0", "edge_mlp_tgt_0", "kernel")][0], k[6:]
    )


def test_gru_bias_split():
    """Keras reset_after bias [2, 3H] splits into input/recurrent rows."""
    rng = np.random.RandomState(3)
    bias = rng.randn(2, 24).astype(np.float32)
    ref_vars = {
        "GGNN_GNN/Layer_1/MessagePassing/bias:0": bias,
        "GGNN_GNN/Layer_1/MessagePassing/kernel:0": rng.randn(8, 24).astype(np.float32),
        "GGNN_GNN/Layer_1/MessagePassing/recurrent_kernel:0": rng.randn(8, 24).astype(np.float32),
    }
    mapped, unmatched = map_reference_variables(ref_vars, log=lambda *_: None)
    assert not unmatched
    np.testing.assert_array_equal(
        mapped[("gnn", "mp_layer_1", "gru_cell", "input_bias")], bias[0]
    )
    np.testing.assert_array_equal(
        mapped[("gnn", "mp_layer_1", "gru_cell", "recurrent_bias")], bias[1]
    )
