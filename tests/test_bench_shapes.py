"""The shipped benchmark shapes must stay ON the fast kernel paths.

``bench.py`` is the driver-recorded headline. Every fast path degrades
EXACTLY (the fallbacks compute the same values), so a VMEM-budget, plan-
layout, or applicability-gate change that silently pushed the shipped
PPI / RGAT / QM9 shapes off the block-pair kernels would keep the suite
green and only surface as a 2-6x throughput regression at the next full
bench run. These pins fail fast instead, and pin BOTH levels of routing
(advisor r3): the shape-only VMEM/plan gates AND the layer-level routing
predicates (aggregation function, message-activation flags), each
evaluated on a layer built from the EXACT shipped hyperparameters.

The workloads come from bench.py itself (build_raw_arrays / build_batch /
build_qm9_batch — the shipped PPI_RGCN / PPI_RGAT / QM9_RGCN
configurations, mirroring reference tf2_gnn/cli_utils/default_hypers/),
so a bench-workload change propagates into these pins automatically.
"""
import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import pytest

import bench
from tf2_gnn_tpu.layers.message_passing.base import get_message_passing_class
from tf2_gnn_tpu.models.node_multiclass_task import NodeMulticlassTask
from tf2_gnn_tpu.models.qm9_regression_task import QM9RegressionTask


def mp_layer_from_task_params(task_cls, flavour, overrides):
    """The MP layer instance the shipped config actually constructs: task
    hypers -> strip the ``gnn_`` prefix -> filter to the flavour's fields
    (the same resolution GraphTaskModel.from_params -> GNN.from_params
    applies), so routing predicates are evaluated on real shipped hypers,
    not hand-picked kwargs."""
    params = task_cls.get_default_hyperparameters(flavour)
    params.update(overrides)
    gnn_params = {k[len("gnn_"):]: v for k, v in params.items()
                  if k.startswith("gnn_")}
    mp_class = get_message_passing_class(
        gnn_params.get("message_calculation_class", flavour))
    mp_fields = {f.name for f in dataclasses.fields(mp_class)
                 if f.init} - {"parent", "name"}
    return mp_class(**{k: v for k, v in gnn_params.items()
                       if k in mp_fields})


# The bench hyper overrides, verbatim from bench.py::measure / measure_rgat.
PPI_RGCN_OVERRIDES = {"gnn_hidden_dim": 320, "gnn_num_layers": 4,
                      "gnn_edge_dtype": "bfloat16"}
PPI_RGAT_OVERRIDES = {"gnn_hidden_dim": 320, "gnn_num_layers": 4,
                      "gnn_num_heads": 4, "gnn_edge_dtype": "bfloat16"}


def qm9_shipped_params():
    shipped = json.loads(
        (Path(bench.__file__).parent / "tf2_gnn_tpu" / "harness"
         / "default_hypers" / "QM9_RGCN.json").read_text())
    params = QM9RegressionTask.get_default_hyperparameters("rgcn")
    params.update(shipped["model_params"])
    return params


@pytest.fixture(scope="module")
def ppi_pair_batch():
    batch, _, real_edges = bench.build_batch(0, use_pallas=False,
                                             use_pairs=True)
    assert real_edges > 200_000  # the headline workload, not a toy
    return batch


def _assert_rides_pair_path(layer, batch, context):
    stream_dtype = jnp.dtype(
        layer.edge_dtype if layer.edge_dtype != "float32" else jnp.float32)
    rows = batch.num_edge_types * batch.pair_src_space
    assert layer._fused_plan_applicable(batch), (
        f"{context}: the layer-level fused routing predicate rejected the "
        "batch — the shipped config would run the per-edge XLA path")
    assert layer._pair_path_applicable_static(batch, rows, stream_dtype), (
        f"{context}: fell off the block-pair kernel path — the fallback "
        "would run silently")


def test_ppi_bench_shape_rides_pair_path(ppi_pair_batch):
    batch = ppi_pair_batch
    assert batch.pair_plans is not None
    layer = mp_layer_from_task_params(NodeMulticlassTask, "rgcn",
                                      PPI_RGCN_OVERRIDES)
    assert layer.edge_dtype == "bfloat16"  # the shipped stream dtype
    _assert_rides_pair_path(layer, batch, "merged-plan PPI bench shape")


def test_ppi_typed_bench_shape_rides_stream_path():
    """The round-5 shipped PPI_RGCN form: per-type row-split plans on the
    single-launch streamed kernel, whose per-type [V, H] resident slice
    runs a full-width single sweep (5.21 vs 6.51 ms/step measured)."""
    shipped = json.loads(
        (Path(bench.__file__).parent / "tf2_gnn_tpu" / "harness"
         / "default_hypers" / "PPI_RGCN.json").read_text())
    assert shipped["task_params"].get("pair_per_type") is True
    batch, _, real_edges = bench.build_batch(0, use_pallas=False,
                                             use_pairs=True,
                                             pair_per_type=True)
    assert real_edges > 200_000
    assert batch.pair_plans_typed is not None and batch.pair_plans is None
    layer = mp_layer_from_task_params(NodeMulticlassTask, "rgcn",
                                      PPI_RGCN_OVERRIDES)
    _assert_rides_pair_path(layer, batch, "shipped PPI_RGCN typed shape")
    # Full-width residency: one type's [V, 384] bf16 slice must stay under
    # the kernel's VMEM budget, or the single-sweep form silently degrades
    # to TILE sweeps.
    from tf2_gnn_tpu.ops.pair_spmm import VMEM_TABLE_BUDGET_BYTES

    padded_h = 384  # 320 padded to the 128-lane tile
    assert (batch.num_nodes_padded * padded_h * 2
            <= VMEM_TABLE_BUDGET_BYTES)


def test_rgat_bench_shape_rides_pair_attention(ppi_pair_batch):
    layer = mp_layer_from_task_params(NodeMulticlassTask, "rgat",
                                      PPI_RGAT_OVERRIDES)
    assert layer.num_heads == 4
    assert layer._pair_attention_applicable_static(ppi_pair_batch), (
        "the shipped PPI_RGAT bench shape fell off the flash pair-attention "
        "path"
    )


def test_spmd_shards_of_bench_workload_ride_pair_path():
    """Round 2's top gap was multi-chip silently riding the slow kernel;
    pin the opposite at PRODUCTION scale: each shard of the bench workload
    (8-way node partition of bench.build_raw_arrays' EXACT graph, per-shard
    pair plans over the ext halo row space) must pass the same fast-path
    gates as single-chip. A random graph maximises the halo, so the
    per-shard ext row space here is the worst case the partitioner can
    produce for this workload."""
    import jax

    from tf2_gnn_tpu.parallel.spmd import partition_graph

    node_features, adjacency, node_to_graph = bench.build_raw_arrays(0)
    sharded, _ = partition_graph(
        node_features, adjacency, node_to_graph, bench.GRAPHS_PER_BATCH,
        num_shards=8, build_pair_plans=True,
    )
    assert sharded.pair_plans is not None and sharded.halo_mode
    shard0 = jax.tree.map(lambda x: x[0], sharded)
    rgcn = mp_layer_from_task_params(NodeMulticlassTask, "rgcn",
                                     PPI_RGCN_OVERRIDES)
    _assert_rides_pair_path(rgcn, shard0, "8-way shard of the bench workload")
    rgat = mp_layer_from_task_params(NodeMulticlassTask, "rgat",
                                     PPI_RGAT_OVERRIDES)
    assert rgat._pair_attention_applicable_static(shard0), (
        "an 8-way shard of the bench workload fell off the flash "
        "pair-attention path under SPMD"
    )


def test_qm9_bench_shape_rides_per_type_pair_path():
    batch, _, mols = bench.build_qm9_batch(0)
    assert mols == 909
    assert batch.pair_plans_typed is not None
    # The layer built from the SHIPPED QM9_RGCN.json with the same default
    # resolution the task applies — if the JSON later ships a bf16
    # override, this pin follows it (advisor r3).
    params = qm9_shipped_params()
    layer = mp_layer_from_task_params(
        QM9RegressionTask, "rgcn",
        {k: v for k, v in params.items() if k.startswith("gnn_")})
    assert layer.hidden_dim == 128
    _assert_rides_pair_path(layer, batch, "shipped QM9_RGCN bench shape")
