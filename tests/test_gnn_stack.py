"""GNN encoder stack: all flavours end-to-end, gradient sanity, stack wiring.

Checks reference-parity structural semantics (tf2_gnn/layers/gnn.py:276-329):
intermediate representations are captured before exchange/layernorm/dense,
dense layers fire at layer 0, global exchange never fires at layer 0, and
everything is differentiable with finite gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.data.graph_batch import PaddingConfig, pad_batch_arrays
from tf2_gnn_tpu.layers.gnn import GNN

FLAVOURS = ("rgcn", "ggnn", "rgat", "rgin", "gnn_edge_mlp", "gnn_film")


def _make_batch(num_nodes=10, dim=6, num_edge_types=2, seed=0):
    config = PaddingConfig(num_nodes=16, num_graphs=4, edge_budgets=(32, 32))
    rng = np.random.RandomState(seed)
    adj = [
        np.stack(
            [rng.randint(0, num_nodes, 12), rng.randint(0, num_nodes, 12)], axis=1
        ).astype(np.int32)
        for _ in range(num_edge_types)
    ]
    return pad_batch_arrays(
        node_features=rng.randn(num_nodes, dim).astype(np.float32),
        adjacency_lists=adj,
        node_to_graph=np.array([0] * 5 + [1] * 5, dtype=np.int32),
        num_graphs=2,
        config=config,
    )


@pytest.mark.parametrize("flavour", FLAVOURS)
def test_gnn_forward_and_grad(flavour):
    batch = _make_batch()
    hp = GNN.get_default_hyperparameters(flavour)
    hidden = 12 if flavour == "rgat" else 8  # rgat: num_heads=3 must divide H
    hp.update({"hidden_dim": hidden, "num_layers": 3})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out, all_reprs = gnn.apply(variables, batch, False)
    assert out.shape == (16, hidden)
    # num_layers MP outputs + the initial projection.
    assert len(all_reprs) == 4
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(params):
        o, _ = gnn.apply({"params": params}, batch, False)
        return jnp.sum(o * o)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    for leaf in leaves:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gnn_layernorm_and_exchange_modes():
    batch = _make_batch()
    for mode in ("mean", "gru", "mlp"):
        hp = GNN.get_default_hyperparameters("rgcn")
        hp.update(
            {
                "hidden_dim": 8,
                "num_layers": 3,
                "use_inter_layer_layernorm": True,
                "global_exchange_mode": mode,
                "global_exchange_every_num_layers": 1,
            }
        )
        gnn = GNN.from_params(hp)
        variables = gnn.init(jax.random.PRNGKey(0), batch, False)
        out, _ = gnn.apply(variables, batch, False)
        assert np.all(np.isfinite(np.asarray(out))), mode


def test_exchange_not_at_layer_zero_dense_at_layer_zero():
    batch = _make_batch()
    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update(
        {
            "hidden_dim": 8,
            "num_layers": 2,
            "global_exchange_every_num_layers": 1,
            "dense_every_num_layers": 1,
        }
    )
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    param_names = set(variables["params"].keys())
    # Dense fires at layers 0 and 1 (reference gnn.py:163,324).
    assert "dense_0" in param_names and "dense_1" in param_names
    # Exchange only at layer 1 (reference gnn.py:172-175,307).
    assert "global_exchange_1" in param_names
    assert "global_exchange_0" not in param_names


def test_intermediates_captured_before_postprocessing():
    # With dense_every=1 the final output passes through a dense layer, but
    # the recorded intermediate for the last MP layer must NOT include it.
    batch = _make_batch()
    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": 8, "num_layers": 1, "dense_every_num_layers": 1})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out, all_reprs = gnn.apply(variables, batch, False)
    # all_reprs[-1] is raw MP output; out went through dense+tanh afterwards.
    assert not np.allclose(np.asarray(out), np.asarray(all_reprs[-1]))
    assert np.asarray(out).shape == np.asarray(all_reprs[-1]).shape


def test_dropout_requires_rng_and_changes_output():
    batch = _make_batch()
    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": 8, "num_layers": 2, "layer_input_dropout_rate": 0.5})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out_eval, _ = gnn.apply(variables, batch, False)
    out_train1, _ = gnn.apply(
        variables, batch, True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    out_train2, _ = gnn.apply(
        variables, batch, True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out_train1), np.asarray(out_train2))
    assert np.all(np.isfinite(np.asarray(out_train1)))
    # Eval path is deterministic.
    out_eval2, _ = gnn.apply(variables, batch, False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))


def test_jit_matches_eager_full_stack():
    batch = _make_batch()
    hp = GNN.get_default_hyperparameters("rgat")
    hp.update({"hidden_dim": 9, "num_layers": 2})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    eager, _ = gnn.apply(variables, batch, False)
    jitted, _ = jax.jit(lambda v, b: gnn.apply(v, b, False))(variables, batch)
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-5
    )


def test_remat_matches_standard():
    """jax.checkpoint-ed MP layers: identical outputs and gradients."""
    batch = _make_batch()
    hp = GNN.get_default_hyperparameters("rgcn")
    hp.update({"hidden_dim": 8, "num_layers": 3})
    gnn = GNN.from_params(hp)
    hp_remat = dict(hp, use_remat=True)
    gnn_remat = GNN.from_params(hp_remat)

    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out_a, _ = gnn.apply(variables, batch, False)
    out_b, _ = gnn_remat.apply(variables, batch, False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    def loss(g, v):
        out, _ = g.apply(v, batch, False)
        return jnp.sum(out * out)

    g_a = jax.grad(lambda v: loss(gnn, v))(variables)
    g_b = jax.grad(lambda v: loss(gnn_remat, v))(variables)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
