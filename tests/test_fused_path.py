"""Fused Pallas message-passing path vs the standard XLA path.

The fused path must be a pure drop-in: identical parameters, near-identical
outputs and gradients for RGCN / GGNN / RGIN (pure source-gather messages with
sum aggregation), and correctly bypassed for flavours it doesn't cover.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.data.graph_dataset import DataFold
from tf2_gnn_tpu.data.jsonl_property_dataset import JsonLGraphPropertyDataset
from tf2_gnn_tpu.layers.gnn import GNN
from tf2_gnn_tpu.ops.spmm_pallas import BLOCK_NODES, build_dual_plans, plan_chunk_budget

from .synthetic_data import write_jsonl_property_dataset


def _dataset(tmp_path, use_pallas):
    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update(
        {
            "num_fwd_edge_types": 1,
            "max_nodes_per_batch": 40,
            "use_pallas_spmm": use_pallas,
        }
    )
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(tmp_path, {DataFold.VALIDATION})
    return ds


def test_pallas_batches_carry_plans_and_aligned_nodes(tmp_path):
    ds = _dataset(tmp_path, use_pallas=True)
    batch, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert batch.scatter_plans is not None
    assert len(batch.scatter_plans) == 12  # MergedScatterPlan.astuple()
    assert batch.num_nodes_padded % BLOCK_NODES == 0


@pytest.mark.parametrize("flavour", ["rgcn", "ggnn", "rgin"])
def test_fused_path_matches_standard(tmp_path, flavour):
    ds_plain = _dataset(tmp_path / "a", use_pallas=False)
    ds_fused = _dataset(tmp_path / "b", use_pallas=True)

    hp = GNN.get_default_hyperparameters(flavour)
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)

    batch_fused, _ = next(ds_fused.batch_iterator(DataFold.VALIDATION))
    # Same underlying graphs; strip the plans to force the standard path on
    # identically padded arrays.
    batch_plain = batch_fused.replace(scatter_plans=None)

    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_fused, _ = gnn.apply(variables, batch_fused, False)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_fused), rtol=1e-4, atol=1e-5
    )

    # Parameter structure identical (checkpoint compatibility).
    vars_fused = gnn.init(jax.random.PRNGKey(0), batch_fused, False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        vars_fused
    )

    # Gradients agree too.
    def loss(v, b):
        out, _ = gnn.apply(v, b, False)
        return (out * out).sum()

    g_plain = jax.grad(loss)(variables, batch_plain)
    g_fused = jax.grad(loss)(variables, batch_fused)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.parametrize("flavour", ["gnn_film", "rgat"])
def test_film_and_rgat_fused_match_standard(tmp_path, flavour):
    """FiLM and RGAT now run fused paths too; outputs and gradients match."""
    ds_fused = _dataset(tmp_path, use_pallas=True)
    batch, _ = next(ds_fused.batch_iterator(DataFold.VALIDATION))
    hp = GNN.get_default_hyperparameters(flavour)
    hp.update({"hidden_dim": 9 if flavour == "rgat" else 8, "num_layers": 2,
               "fused_target_gather": True})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out_with, _ = gnn.apply(variables, batch, False)
    out_without, _ = gnn.apply(variables, batch.replace(scatter_plans=None),
                               False)
    np.testing.assert_allclose(np.asarray(out_with), np.asarray(out_without),
                               rtol=1e-4, atol=1e-4)

    def loss(v, b):
        out, _ = gnn.apply(v, b, False)
        return (out * out).sum()

    g_with = jax.grad(loss)(variables, batch)
    g_without = jax.grad(loss)(variables, batch.replace(scatter_plans=None))
    for a, b in zip(jax.tree.leaves(g_with), jax.tree.leaves(g_without)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_edge_mlp_with_target_state_fused_matches(tmp_path):
    """0-hidden-layer target-state edge MLP runs the fused gather pair."""
    ds_fused = _dataset(tmp_path, use_pallas=True)
    batch, _ = next(ds_fused.batch_iterator(DataFold.VALIDATION))
    hp = GNN.get_default_hyperparameters("gnn_edge_mlp")
    hp.update({"hidden_dim": 8, "num_layers": 2,
               "num_edge_MLP_hidden_layers": 0,
               "fused_target_gather": True})
    assert hp["use_target_state_as_input"] is True
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out_with, _ = gnn.apply(variables, batch, False)
    out_without, _ = gnn.apply(variables, batch.replace(scatter_plans=None), False)
    np.testing.assert_allclose(np.asarray(out_with), np.asarray(out_without),
                               rtol=1e-4, atol=1e-4)

    # The default 1-HIDDEN-layer form rides the commuted-W2 fused path:
    # out[v] = sum_l W2_l R_l[v] with R_l the per-type aggregate of
    # relu(first-layer halves) — the per-edge matmuls vanish. Forward AND
    # gradients must match the unfused per-edge computation.
    hp2 = GNN.get_default_hyperparameters("gnn_edge_mlp")
    hp2.update({"hidden_dim": 8, "num_layers": 1})
    gnn2 = GNN.from_params(hp2)
    v2 = gnn2.init(jax.random.PRNGKey(0), batch, False)
    a, _ = gnn2.apply(v2, batch, False)
    b, _ = gnn2.apply(v2, batch.replace(scatter_plans=None), False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)

    def loss2(vs, bb):
        out, _ = gnn2.apply(vs, bb, False)
        return jnp.sum(out ** 2)

    g_with = jax.grad(loss2)(v2, batch)
    g_without = jax.grad(loss2)(v2, batch.replace(scatter_plans=None))
    for x, y in zip(jax.tree.leaves(g_with), jax.tree.leaves(g_without)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-3)

    # Deeper target-state MLPs (>= 2 hidden) still bypass fusion exactly.
    hp3 = GNN.get_default_hyperparameters("gnn_edge_mlp")
    hp3.update({"hidden_dim": 8, "num_layers": 1,
                "num_edge_MLP_hidden_layers": 2})
    gnn3 = GNN.from_params(hp3)
    v3 = gnn3.init(jax.random.PRNGKey(0), batch, False)
    a3, _ = gnn3.apply(v3, batch, False)
    b3, _ = gnn3.apply(v3, batch.replace(scatter_plans=None), False)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(b3), atol=1e-6)


def test_bf16_edge_dtype_close_to_f32(tmp_path):
    ds_fused = _dataset(tmp_path, use_pallas=True)
    batch, _ = next(ds_fused.batch_iterator(DataFold.VALIDATION))
    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn32 = GNN.from_params(hp)
    hp16 = dict(hp, edge_dtype="bfloat16")
    gnn16 = GNN.from_params(hp16)
    variables = gnn32.init(jax.random.PRNGKey(0), batch, False)
    out32, _ = gnn32.apply(variables, batch, False)
    out16, _ = gnn16.apply(variables, batch, False)
    assert np.asarray(out16).dtype == np.float32  # f32 accumulation
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16),
                               rtol=0.05, atol=0.05)


def _pair_dataset(tmp_path):
    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update(
        {
            "num_fwd_edge_types": 1,
            "max_nodes_per_batch": 40,
            "use_pair_spmm": True,
        }
    )
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(tmp_path, {DataFold.VALIDATION})
    return ds


def test_pair_batches_carry_plans(tmp_path):
    ds = _pair_dataset(tmp_path)
    assert ds.padding_config.pair_chunks_fwd is not None
    batch, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert batch.pair_plans is not None
    assert len(batch.pair_plans) == 13  # PairPlans.astuple()
    assert batch.scatter_plans is None  # pair mode alone doesn't build these


def test_pair_decline_falls_back_without_module_clash(tmp_path, monkeypatch):
    """When the pair table exceeds the VMEM budget and no scatter plans
    exist, the layer must decline BEFORE creating the node-space MLP modules
    (regression: creating them and then falling back to the unfused path
    raised flax NameInUseError on the shared edge_mlp_layer_* names)."""
    from tf2_gnn_tpu.ops import pair_spmm as ps

    monkeypatch.setattr(ps, "pair_kernel_applicable",
                        lambda rows, dtype: False)
    ds = _pair_dataset(tmp_path)
    batch, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert batch.scatter_plans is None

    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out_declined, _ = gnn.apply(variables, batch, False)
    out_plain, _ = gnn.apply(variables, batch.replace(pair_plans=None), False)
    np.testing.assert_allclose(np.asarray(out_declined),
                               np.asarray(out_plain), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("flavour", ["rgcn", "ggnn", "rgin"])
def test_pair_path_matches_standard(tmp_path, flavour):
    """The block-pair kernel path is a pure drop-in for the source-table
    flavours: same params, outputs, and gradients as the plain XLA path."""
    ds = _pair_dataset(tmp_path)
    batch_pair, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    batch_plain = batch_pair.replace(pair_plans=None)

    hp = GNN.get_default_hyperparameters(flavour)
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_pair, _ = gnn.apply(variables, batch_pair, False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pair),
                               rtol=1e-4, atol=1e-5)

    def loss(v, b):
        out, _ = gnn.apply(v, b, False)
        return (out * out).sum()

    g_plain = jax.grad(loss)(variables, batch_plain)
    g_pair = jax.grad(loss)(variables, batch_pair)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def _merged_pair_dataset(tmp_path):
    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update(
        {
            "num_fwd_edge_types": 1,
            "max_nodes_per_batch": 40,
            "use_pair_spmm": True,
            "pair_merge_targets": True,
        }
    )
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(tmp_path, {DataFold.VALIDATION})
    return ds


@pytest.mark.parametrize("flavour", ["rgcn", "ggnn", "rgin"])
def test_merged_pair_joint_sum_matches_standard(tmp_path, flavour):
    """Merged-target plans still serve the joint-sum flavours (the per-type
    aggregates reduce over the type axis)."""
    ds = _merged_pair_dataset(tmp_path)
    batch_pair, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert batch_pair.pair_targets_merged
    batch_plain = batch_pair.replace(pair_plans=None)

    hp = GNN.get_default_hyperparameters(flavour)
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_pair, _ = gnn.apply(variables, batch_pair, False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pair),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("target_state", [False, True])
@pytest.mark.parametrize("normalize", [False, True])
def test_merged_pair_film_factorised_matches_standard(tmp_path, normalize,
                                                      target_state):
    """The factorised FiLM pair path (gamma_l[v] * S_l[v] + deg_l[v] *
    beta_l[v]) matches the per-edge standard path, outputs and gradients —
    including the PPI config's target-state message form."""
    ds = _merged_pair_dataset(tmp_path)
    batch_pair, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    batch_plain = batch_pair.replace(pair_plans=None)

    hp = GNN.get_default_hyperparameters("gnn_film")
    hp.update({"hidden_dim": 8, "num_layers": 2,
               "normalize_by_num_incoming": normalize,
               "use_target_state_as_input": target_state})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_pair, _ = gnn.apply(variables, batch_pair, False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pair),
                               rtol=1e-4, atol=1e-4)

    def loss(v, b):
        out, _ = gnn.apply(v, b, False)
        return (out * out).sum()

    g_plain = jax.grad(loss)(variables, batch_plain)
    g_pair = jax.grad(loss)(variables, batch_pair)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.parametrize("normalize", [False, True])
def test_merged_pair_target_state_edge_mlp_matches(tmp_path, normalize):
    """0-hidden-layer target-state edge MLP factorises through the merged
    pair plans: S_l(v) + c_l(v) * (W_tgt h_v), no per-edge target gather."""
    ds = _merged_pair_dataset(tmp_path)
    batch_pair, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    batch_plain = batch_pair.replace(pair_plans=None)

    hp = GNN.get_default_hyperparameters("gnn_edge_mlp")
    hp.update({"hidden_dim": 8, "num_layers": 2,
               "num_edge_MLP_hidden_layers": 0,
               "normalize_by_num_incoming": normalize})
    assert hp["use_target_state_as_input"] is True
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_pair, _ = gnn.apply(variables, batch_pair, False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pair),
                               rtol=1e-4, atol=1e-4)

    def loss(v, b):
        out, _ = gnn.apply(v, b, False)
        return (out * out).sum()

    g_plain = jax.grad(loss)(variables, batch_plain)
    g_pair = jax.grad(loss)(variables, batch_pair)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_fused_path_with_empty_edge_type(tmp_path):
    """A type with zero real edges (all-sentinel chunks) must aggregate to 0."""
    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update(
        {
            "num_fwd_edge_types": 2,       # second fwd type never populated
            "tie_fwd_bkwd_edges": True,
            "max_nodes_per_batch": 40,
            "use_pallas_spmm": True,
        }
    )
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(tmp_path, {DataFold.VALIDATION})
    batch, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert int(np.asarray(batch.num_edges)[-1]) == 0  # empty type exists

    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out_fused, _ = gnn.apply(variables, batch, False)
    out_plain, _ = gnn.apply(variables, batch.replace(scatter_plans=None), False)
    assert np.all(np.isfinite(np.asarray(out_fused)))
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=1e-4, atol=1e-5)


def _typed_pair_dataset(tmp_path):
    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update(
        {
            "num_fwd_edge_types": 1,
            "max_nodes_per_batch": 40,
            "use_pair_spmm": True,
            "pair_per_type": True,
        }
    )
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(tmp_path, {DataFold.VALIDATION})
    return ds


@pytest.mark.parametrize("flavour",
                         ["rgcn", "ggnn", "rgin", "gnn_film", "rgat",
                          "gnn_edge_mlp", "gnn_edge_mlp_0hidden"])
def test_per_type_pair_path_matches_standard(tmp_path, flavour):
    """The row-split per-type pair plans (one [V]-row launch per edge type —
    the form for graphs whose merged [L*V] tables exceed VMEM, and since
    round 5 the FAST form for the PPI-scale joint-sum and factorised
    flavours) are a pure drop-in: same params, outputs, and gradients as
    the plain XLA path."""
    ds = _typed_pair_dataset(tmp_path)
    batch_pair, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert batch_pair.pair_plans is None
    assert batch_pair.pair_plans_typed is not None
    assert len(batch_pair.pair_plans_typed) == batch_pair.num_edge_types
    batch_plain = batch_pair.replace(pair_plans_typed=None)

    extra = {}
    if flavour == "gnn_edge_mlp_0hidden":
        flavour, extra = "gnn_edge_mlp", {"num_edge_MLP_hidden_layers": 0}
    hp = GNN.get_default_hyperparameters(flavour)
    hp.update({"hidden_dim": 8, "num_layers": 2, **extra})
    if flavour == "rgat":
        hp["num_heads"] = 4
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_pair, _ = gnn.apply(variables, batch_pair, False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pair),
                               rtol=1e-4, atol=1e-5)

    def loss(v, b):
        out, _ = gnn.apply(v, b, False)
        return (out * out).sum()

    g_plain = jax.grad(loss)(variables, batch_plain)
    g_pair = jax.grad(loss)(variables, batch_pair)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)
