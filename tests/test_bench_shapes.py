"""The shipped benchmark shapes must stay ON the fast kernel paths.

``bench.py`` is the driver-recorded headline. Every fast path degrades
EXACTLY (the fallbacks compute the same values), so a VMEM-budget, plan-
layout, or applicability-gate change that silently pushed the shipped
PPI / RGAT / QM9 shapes off the block-pair kernels would keep the suite
green and only surface as a 2-6x throughput regression at the next full
bench run. These pins fail fast instead: the applicability gates are
shape-only host logic (gnn_edge_mlp.py::_pair_path_applicable_static,
rgat.py::_pair_attention_applicable_static), so they run on CPU in CI.

The shapes and hyperparameters mirror bench.py::measure / measure_rgat /
measure_qm9 (the shipped PPI_RGCN / PPI_RGAT / QM9_RGCN configurations:
reference default_hypers, tf2_gnn/cli_utils/default_hypers/).
"""
import jax.numpy as jnp
import pytest

import bench
from tf2_gnn_tpu.layers.message_passing.rgat import RGAT
from tf2_gnn_tpu.layers.message_passing.rgcn import RGCN


@pytest.fixture(scope="module")
def ppi_pair_batch():
    batch, _, real_edges = bench.build_batch(0, use_pallas=False,
                                             use_pairs=True)
    assert real_edges > 200_000  # the headline workload, not a toy
    return batch


def test_ppi_bench_shape_rides_pair_path(ppi_pair_batch):
    batch = ppi_pair_batch
    assert batch.pair_plans is not None
    layer = RGCN(hidden_dim=320, edge_dtype="bfloat16")
    rows = batch.num_edge_types * batch.pair_src_space
    assert layer._pair_path_applicable_static(batch, rows, jnp.bfloat16), (
        "the shipped PPI_RGCN bench shape fell off the block-pair kernel "
        "path — the headline would silently run the sorted-scatter fallback"
    )


def test_rgat_bench_shape_rides_pair_attention(ppi_pair_batch):
    layer = RGAT(hidden_dim=320, num_heads=4, edge_dtype="bfloat16")
    assert layer._pair_attention_applicable_static(ppi_pair_batch), (
        "the shipped PPI_RGAT bench shape fell off the flash pair-attention "
        "path"
    )


def test_spmd_shards_of_bench_workload_ride_pair_path():
    """Round 2's top gap was multi-chip silently riding the slow kernel;
    pin the opposite at PRODUCTION scale: each shard of the bench workload
    (8-way node partition, per-shard pair plans over the ext halo row
    space) must pass the same fast-path gates as single-chip. A random
    graph maximises the halo, so the per-shard ext row space here is the
    worst case the partitioner can produce for this workload."""
    import jax
    import numpy as np

    from tf2_gnn_tpu.parallel.spmd import partition_graph

    rng = np.random.RandomState(0)
    v = bench.GRAPHS_PER_BATCH * bench.NODES_PER_GRAPH
    adjacency = []
    for kind in ("loops", "fwd", "bkwd"):
        if kind == "loops":
            nodes = np.arange(v, dtype=np.int32)
            adjacency.append(np.stack([nodes, nodes], axis=1))
            continue
        chunks = []
        for g in range(bench.GRAPHS_PER_BATCH):
            base = g * bench.NODES_PER_GRAPH
            src = rng.randint(0, bench.NODES_PER_GRAPH,
                              bench.FWD_EDGES_PER_GRAPH) + base
            tgt = rng.randint(0, bench.NODES_PER_GRAPH,
                              bench.FWD_EDGES_PER_GRAPH) + base
            pair = (src, tgt) if kind == "fwd" else (tgt, src)
            chunks.append(np.stack(pair, axis=1))
        adjacency.append(np.concatenate(chunks).astype(np.int32))
    node_to_graph = np.repeat(
        np.arange(bench.GRAPHS_PER_BATCH, dtype=np.int32),
        bench.NODES_PER_GRAPH)

    sharded, _ = partition_graph(
        rng.randn(v, bench.FEATURE_DIM).astype(np.float32), adjacency,
        node_to_graph, bench.GRAPHS_PER_BATCH, num_shards=8,
        build_pair_plans=True,
    )
    assert sharded.pair_plans is not None and sharded.halo_mode
    shard0 = jax.tree.map(lambda x: x[0], sharded)
    rows = shard0.num_edge_types * shard0.pair_src_space
    assert RGCN(hidden_dim=320, edge_dtype="bfloat16") \
        ._pair_path_applicable_static(shard0, rows, jnp.bfloat16), (
        "an 8-way shard of the bench workload fell off the block-pair "
        "kernel path — SPMD would silently run the sorted-scatter fallback"
    )
    assert RGAT(hidden_dim=320, num_heads=4, edge_dtype="bfloat16") \
        ._pair_attention_applicable_static(shard0), (
        "an 8-way shard of the bench workload fell off the flash "
        "pair-attention path under SPMD"
    )


def test_qm9_bench_shape_rides_per_type_pair_path():
    batch, _, mols = bench.build_qm9_batch(0)
    assert mols == 909
    assert batch.pair_plans_typed is not None
    # QM9_RGCN ships f32 streams (harness/default_hypers/QM9_RGCN.json).
    layer = RGCN(hidden_dim=128, edge_dtype="float32")
    rows = batch.num_edge_types * batch.pair_src_space
    assert layer._pair_path_applicable_static(batch, rows, jnp.float32), (
        "the shipped QM9_RGCN bench shape fell off the per-type row-split "
        "pair path"
    )
