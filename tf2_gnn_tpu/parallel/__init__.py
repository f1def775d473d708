"""Scale-out layer: device meshes, data-parallel training, graph partitioning.

The reference is strictly single-device (SURVEY.md §2.4: no DP/TP/PP/SP, no
collectives anywhere); this package is designed TPU-first instead of ported:

* ``data_parallel`` — DP over whole graphs: each device trains on its own
  padded mega-batch, gradients are ``pmean``-ed over the mesh (the GNN analog
  of batch DP).
* ``spmd`` — node/edge-partitioned execution of ONE giant graph across the
  mesh (the GNN analog of sequence/context parallelism): each device owns a
  contiguous node range plus all edges targeting it; per layer, only the
  host-planned BOUNDARY rows are exchanged over ICI (one all_to_all) and
  aggregation stays local.
* ``multiprocess`` — jax.distributed wiring so the same shard_map schemes
  span N>=2 hosts (global meshes, host-local -> global array lifting).
"""
from .data_parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    shard_batches,
    stack_batches,
)
from .multiprocess import (
    distribute_batch,
    global_mesh,
    initialize_multiprocess,
    replicate_to_mesh,
)
from .hybrid import (
    make_hybrid_mesh,
    make_hybrid_train_step,
    stack_partitioned_batches,
)
from .reorder import (
    apply_node_permutation,
    invert_permutation,
    locality_reorder,
)
from .spmd import (
    make_spmd_eval_step,
    make_spmd_forward,
    make_spmd_train_step,
    partition_graph,
    restore_node_order,
)

__all__ = [
    "distribute_batch",
    "global_mesh",
    "initialize_multiprocess",
    "replicate_to_mesh",
    "make_dp_eval_step",
    "make_dp_train_step",
    "make_hybrid_mesh",
    "make_hybrid_train_step",
    "make_mesh",
    "make_spmd_eval_step",
    "make_spmd_forward",
    "make_spmd_train_step",
    "partition_graph",
    "restore_node_order",
    "apply_node_permutation",
    "invert_permutation",
    "locality_reorder",
    "shard_batches",
    "stack_partitioned_batches",
    "stack_batches",
]
