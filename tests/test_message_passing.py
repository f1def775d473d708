"""Hand-computed message-passing semantics + eager/jit equivalence.

Mirrors the reference's test/layers/test_message_passing.py: a minimal
"pass source states" MessagePassing subclass must produce exactly-known node
states on tiny graphs (identity message + sum aggregation + ReLU), and the
jitted computation must equal the un-jitted one.
"""
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tf2_gnn_tpu.data.graph_batch import PaddingConfig, pad_batch_arrays
from tf2_gnn_tpu.layers.message_passing import (
    get_known_message_passing_classes,
    get_message_passing_class,
    register_message_passing_implementation,
)
from tf2_gnn_tpu.layers.message_passing.base import (
    MessagePassing,
    calculate_type_to_num_incoming_edges,
)
from tf2_gnn_tpu.ops.segment import gather_rows


@register_message_passing_implementation
class PassSourceStates(MessagePassing):
    """Identity message function: each edge forwards its source state."""

    def _compute_messages_per_type(self, node_states, batch, training):
        return [
            gather_rows(node_states, sources) for sources in batch.edge_sources
        ]


def _make_batch(node_states: np.ndarray, adjacency_lists: List[np.ndarray],
                num_nodes_padded=8, edge_budget=16):
    num_nodes = node_states.shape[0]
    config = PaddingConfig(
        num_nodes=num_nodes_padded,
        num_graphs=2,
        edge_budgets=(edge_budget,) * len(adjacency_lists),
    )
    return pad_batch_arrays(
        node_features=node_states.astype(np.float32),
        adjacency_lists=[np.asarray(a, dtype=np.int32).reshape(-1, 2)
                         for a in adjacency_lists],
        node_to_graph=np.zeros(num_nodes, dtype=np.int32),
        num_graphs=1,
        config=config,
    )


def _run(node_states, adjacency_lists, **mp_kwargs):
    batch = _make_batch(np.asarray(node_states, dtype=np.float32),
                        adjacency_lists)
    layer = PassSourceStates(
        hidden_dim=np.asarray(node_states).shape[1], **mp_kwargs
    )
    variables = layer.init(jax.random.PRNGKey(0), batch.node_features, batch)
    out = layer.apply(variables, batch.node_features, batch)
    return np.asarray(out)[: np.asarray(node_states).shape[0]]


def test_sum_aggregation_line_graph():
    # 0 -> 1 -> 2; message = source state; sum + relu.
    states = [[1.0, -2.0], [3.0, 4.0], [-5.0, 6.0]]
    out = _run(states, [[[0, 1], [1, 2]]])
    np.testing.assert_allclose(out, [[0.0, 0.0], [1.0, 0.0], [3.0, 4.0]])


def test_sum_aggregation_multiple_incoming():
    # Edges 0->2 and 1->2: node 2 receives sum of both sources.
    states = [[1.0, -1.0], [2.0, 3.0], [0.0, 0.0]]
    out = _run(states, [[[0, 2], [1, 2]]])
    np.testing.assert_allclose(out, [[0.0, 0.0], [0.0, 0.0], [3.0, 2.0]])


def test_two_edge_types_aggregate_jointly():
    # Type A: 0->2; type B: 1->2. Aggregation runs over the concat of types.
    states = [[1.0, 0.0], [0.0, 2.0], [0.0, 0.0]]
    out = _run(states, [[[0, 2]], [[1, 2]]])
    np.testing.assert_allclose(out, [[0.0, 0.0], [0.0, 0.0], [1.0, 2.0]])


def test_mean_aggregation():
    states = [[2.0, 2.0], [4.0, -6.0], [0.0, 0.0]]
    out = _run(states, [[[0, 2], [1, 2]]], aggregation_function="mean")
    np.testing.assert_allclose(out, [[0.0, 0.0], [0.0, 0.0], [3.0, 0.0]])


def test_max_aggregation():
    states = [[2.0, -2.0], [4.0, -6.0], [0.0, 0.0]]
    out = _run(states, [[[0, 2], [1, 2]]], aggregation_function="max")
    np.testing.assert_allclose(out, [[0.0, 0.0], [0.0, 0.0], [4.0, 0.0]])


def test_sqrt_n_aggregation():
    states = [[2.0, 0.0], [4.0, 0.0], [0.0, 0.0]]
    out = _run(states, [[[0, 2], [1, 2]]], aggregation_function="sqrt_n")
    np.testing.assert_allclose(
        out, [[0.0, 0.0], [0.0, 0.0], [6.0 / np.sqrt(2.0), 0.0]], rtol=1e-6
    )


def test_activation_before_aggregation():
    # relu applied per message BEFORE summing: relu(-5)+relu(3) = 3,
    # while relu(-5+3) = 0 after aggregation.
    states = [[-5.0], [3.0], [0.0]]
    before = _run(states, [[[0, 2], [1, 2]]],
                  message_activation_before_aggregation=True)
    after = _run(states, [[[0, 2], [1, 2]]],
                 message_activation_before_aggregation=False)
    np.testing.assert_allclose(before[2], [3.0])
    np.testing.assert_allclose(after[2], [0.0])


def test_padding_rows_do_not_leak_into_real_nodes():
    states = np.array([[1.0, 2.0], [3.0, 4.0], [-5.0, 6.0]], dtype=np.float32)
    adj = [[[0, 1], [1, 2]]]
    small = _run(states, adj)
    # Re-run with a much bigger pad budget: real-node outputs must be identical.
    batch_big = _make_batch(states, adj, num_nodes_padded=32, edge_budget=64)
    layer = PassSourceStates(hidden_dim=2)
    variables = layer.init(jax.random.PRNGKey(0), batch_big.node_features, batch_big)
    big = np.asarray(layer.apply(variables, batch_big.node_features, batch_big))[:3]
    np.testing.assert_allclose(small, big, atol=1e-6)


def test_jit_matches_eager():
    states = np.random.randn(5, 4).astype(np.float32)
    batch = _make_batch(states, [[[0, 1], [1, 2], [3, 4], [2, 0]]])
    layer = PassSourceStates(hidden_dim=4)
    variables = layer.init(jax.random.PRNGKey(0), batch.node_features, batch)
    eager = layer.apply(variables, batch.node_features, batch)
    jitted = jax.jit(
        lambda v, b: layer.apply(v, b.node_features, b)
    )(variables, batch)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-6)


def test_incoming_edge_count():
    batch = _make_batch(
        np.zeros((4, 2), dtype=np.float32),
        [[[0, 1], [2, 1], [3, 1]], [[1, 0]]],
    )
    counts = np.asarray(calculate_type_to_num_incoming_edges(batch))
    assert counts.shape[0] == 2
    np.testing.assert_array_equal(counts[0][:4], [0, 3, 0, 0])
    np.testing.assert_array_equal(counts[1][:4], [1, 0, 0, 0])


def test_registry_contains_all_flavours():
    known = get_known_message_passing_classes()
    for name in ("rgcn", "ggnn", "rgat", "rgin", "gnn_edge_mlp", "gnn_film"):
        assert name in known
        assert get_message_passing_class(name) is not None
