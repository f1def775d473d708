"""Parameter shape/count tests per MP flavour.

Mirrors the reference's test/layers/test_RGCN.py and test_RGAT.py: after
initialisation, each flavour owns exactly the expected parameter tensors.
The reference keeps one [D, H] Dense kernel per edge type; the TPU-native
design stacks them into a single [L, D, H] tensor (same parameter count).
"""
import jax
import numpy as np

from tf2_gnn_tpu.data.graph_batch import PaddingConfig, pad_batch_arrays
from tf2_gnn_tpu.layers.message_passing import get_message_passing_class


def _flatten_params(variables):
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
        for path, leaf in flat
    }


def _make_batch(num_nodes=6, dim=4, num_edge_types=3):
    config = PaddingConfig(
        num_nodes=num_nodes + 2, num_graphs=2,
        edge_budgets=(8,) * num_edge_types,
    )
    rng = np.random.RandomState(0)
    return pad_batch_arrays(
        node_features=rng.randn(num_nodes, dim).astype(np.float32),
        adjacency_lists=[
            np.array([[0, 1], [1, 2]], dtype=np.int32)
            for _ in range(num_edge_types)
        ],
        node_to_graph=np.zeros(num_nodes, dtype=np.int32),
        num_graphs=1,
        config=config,
    )


def _init(flavour, hidden_dim=12, dim=4, num_edge_types=3, **kwargs):
    batch = _make_batch(dim=dim, num_edge_types=num_edge_types)
    cls = get_message_passing_class(flavour)
    layer = cls(hidden_dim=hidden_dim, **kwargs)
    variables = layer.init(
        jax.random.PRNGKey(0), batch.node_features, batch
    )
    return _flatten_params(variables), batch


def test_rgcn_parameter_shapes():
    # RGCN = one linear [D, H] per edge type, stacked [L, D, H]; nothing else.
    params, _ = _init("rgcn", hidden_dim=12, dim=4, num_edge_types=3)
    assert len(params) == 1
    (kernel,) = params.values()
    assert kernel.shape == (3, 4, 12)


def test_gnn_edge_mlp_with_target_state_shapes():
    # First layer splits into source/target halves [L, D, H] each, plus the
    # final output layer [L, H, H] (1 hidden layer default).
    params, _ = _init("gnn_edge_mlp", hidden_dim=12, dim=4, num_edge_types=2)
    shapes = sorted(v.shape for v in params.values())
    assert shapes == [(2, 4, 12), (2, 4, 12), (2, 12, 12)]


def test_rgat_parameter_shapes():
    # RGAT: stacked kernel [L, D, H] + attention parameters [L, K, 2H/K].
    params, _ = _init("rgat", hidden_dim=12, dim=4, num_edge_types=3,
                      num_heads=3)
    assert len(params) == 2
    shapes = {k: v.shape for k, v in params.items()}
    assert (3, 4, 12) in shapes.values()
    assert (3, 3, 8) in shapes.values()  # [L, K, 2 * (12/3)]


def test_ggnn_parameter_shapes():
    # GGNN: per-type kernel [L, H, H] + shared GRU (kernel, recurrent, 2 biases).
    params, _ = _init("ggnn", hidden_dim=12, dim=12, num_edge_types=2)
    shapes = sorted(str(v.shape) for v in params.values())
    assert len(params) == 5
    kernel_shapes = [v.shape for v in params.values()]
    assert (2, 12, 12) in kernel_shapes          # stacked per-type linear
    assert (12, 36) in kernel_shapes             # GRU input kernel
    assert kernel_shapes.count((36,)) == 2       # two GRU biases


def test_rgin_parameter_shapes():
    # RGIN default: per-type MLP with 1 hidden layer -> two stacked kernels.
    params, _ = _init("rgin", hidden_dim=12, dim=4, num_edge_types=2)
    shapes = [v.shape for v in params.values()]
    assert (2, 4, 12) in shapes
    assert (2, 12, 12) in shapes
    assert len(params) == 2


def test_gnn_film_parameter_shapes():
    # GNN-FiLM: message kernel [L, D, H] + FiLM kernel [L, D, 2H].
    params, _ = _init("gnn_film", hidden_dim=12, dim=4, num_edge_types=2)
    shapes = [v.shape for v in params.values()]
    assert (2, 4, 12) in shapes
    assert (2, 4, 24) in shapes
    assert len(params) == 2


def test_output_shapes_all_flavours():
    for flavour in ("rgcn", "ggnn", "rgat", "rgin", "gnn_edge_mlp", "gnn_film"):
        dim = 12 if flavour == "ggnn" else 4
        cls = get_message_passing_class(flavour)
        batch = _make_batch(dim=dim, num_edge_types=2)
        layer = cls(hidden_dim=12)
        variables = layer.init(jax.random.PRNGKey(0), batch.node_features, batch)
        out = layer.apply(variables, batch.node_features, batch)
        assert out.shape == (batch.num_nodes_padded, 12), flavour
        assert np.all(np.isfinite(np.asarray(out))), flavour


def test_typed_linear_compute_dtype():
    """Mixed-precision TypedLinear: f32 master params, bf16 operands, f32
    accumulation — output within bf16 rounding of the f32 form, parameters
    identical (the cast never touches the stored kernel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf2_gnn_tpu.layers.message_passing.typed_linear import TypedLinear

    x = jnp.asarray(np.random.RandomState(0).randn(40, 16).astype(np.float32))
    f32 = TypedLinear(3, 16, 8)
    bf16 = TypedLinear(3, 16, 8, compute_dtype="bfloat16")
    variables = f32.init(jax.random.PRNGKey(0), x)
    out32 = f32.apply(variables, x)
    out16 = bf16.apply(variables, x)
    assert out16.dtype == jnp.float32  # accumulation/output stay f32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=2e-2, atol=2e-2)
