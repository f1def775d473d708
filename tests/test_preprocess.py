"""Exact-output tests for adjacency preprocessing.

Covers the same behaviour space as the reference's test/data/test_utils.py:
backward-edge addition (tied / untied / per-type list), self-loop insertion at
positive and negative indices, in-degree computation.
Reference semantics: tf2_gnn/data/utils.py:9-133.
"""
import numpy as np
import pytest

from tf2_gnn_tpu.data.preprocess import (
    compute_number_of_edge_types,
    get_tied_edge_types,
    process_adjacency_lists,
)

# One forward type: 0->1, 1->2.
FWD = [np.array([[0, 1], [1, 2]], dtype=np.int32)]
# Two forward types.
FWD2 = [
    np.array([[0, 1], [1, 2]], dtype=np.int32),
    np.array([[2, 0]], dtype=np.int32),
]


def test_tied_edge_types_bool_and_list():
    assert get_tied_edge_types(True, 3) == {0, 1, 2}
    assert get_tied_edge_types(False, 3) == set()
    assert get_tied_edge_types([1], 3) == {1}


def test_number_of_edge_types():
    assert compute_number_of_edge_types(set(), 2, False) == 4
    assert compute_number_of_edge_types({0, 1}, 2, False) == 2
    assert compute_number_of_edge_types({0}, 2, True) == 4


def test_tied_backward_no_self_loops():
    adj, in_deg = process_adjacency_lists(FWD, 3, False, {0})
    assert len(adj) == 1
    np.testing.assert_array_equal(
        adj[0], [[0, 1], [1, 2], [1, 0], [2, 1]]
    )
    np.testing.assert_array_equal(in_deg, [[1, 2, 1]])


def test_untied_backward_appends_fresh_type():
    adj, in_deg = process_adjacency_lists(FWD, 3, False, set())
    assert len(adj) == 2
    np.testing.assert_array_equal(adj[0], [[0, 1], [1, 2]])
    np.testing.assert_array_equal(adj[1], [[1, 0], [2, 1]])
    np.testing.assert_array_equal(in_deg, [[0, 1, 1], [1, 1, 0]])


def test_self_loops_inserted_at_front_by_default():
    adj, in_deg = process_adjacency_lists(FWD, 3, True, {0})
    assert len(adj) == 2
    np.testing.assert_array_equal(adj[0], [[0, 0], [1, 1], [2, 2]])
    np.testing.assert_array_equal(adj[1], [[0, 1], [1, 2], [1, 0], [2, 1]])


def test_self_loops_at_positive_index():
    adj, _ = process_adjacency_lists(FWD2, 3, True, {0, 1}, self_loop_edge_type=1)
    assert len(adj) == 3
    np.testing.assert_array_equal(adj[0], [[0, 1], [1, 2], [1, 0], [2, 1]])
    np.testing.assert_array_equal(adj[1], [[0, 0], [1, 1], [2, 2]])
    np.testing.assert_array_equal(adj[2], [[2, 0], [0, 2]])


def test_self_loops_at_negative_index_appends_last():
    adj, _ = process_adjacency_lists(FWD, 3, True, {0}, self_loop_edge_type=-1)
    assert len(adj) == 2
    np.testing.assert_array_equal(adj[0], [[0, 1], [1, 2], [1, 0], [2, 1]])
    np.testing.assert_array_equal(adj[1], [[0, 0], [1, 1], [2, 2]])


def test_self_loops_negative_index_middle():
    # With 2 untied fwd types -> 4 types after backward; -2 inserts at index 3.
    adj, _ = process_adjacency_lists(FWD2, 3, True, set(), self_loop_edge_type=-2)
    assert len(adj) == 5
    np.testing.assert_array_equal(adj[3], [[0, 0], [1, 1], [2, 2]])


def test_self_loop_type_out_of_range_raises():
    with pytest.raises(AssertionError):
        process_adjacency_lists(FWD, 3, True, {0}, self_loop_edge_type=5)


def test_per_type_tying_mix():
    # Type 0 tied, type 1 untied: 2 fwd -> types [0(tied), 1(fwd), 2(bkwd of 1)].
    adj, _ = process_adjacency_lists(FWD2, 3, False, {0})
    assert len(adj) == 3
    np.testing.assert_array_equal(adj[0], [[0, 1], [1, 2], [1, 0], [2, 1]])
    np.testing.assert_array_equal(adj[1], [[2, 0]])
    np.testing.assert_array_equal(adj[2], [[0, 2]])


def test_empty_adjacency_list_handled():
    adj, in_deg = process_adjacency_lists(
        [np.zeros((0, 2), dtype=np.int32)], 3, True, {0}
    )
    assert adj[1].shape == (0, 2)
    np.testing.assert_array_equal(adj[0], [[0, 0], [1, 1], [2, 2]])
    np.testing.assert_array_equal(in_deg[0], [1, 1, 1])
