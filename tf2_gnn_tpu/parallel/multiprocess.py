"""Multi-process (multi-host) execution: jax.distributed + global meshes.

The reference is strictly single-process (its training loop is a plain
in-process Keras fit, tf2_gnn/models/graph_task_model.py:367-398); this
module provides the N>=2-hosts execution path BASELINE.md asks for. The
design follows the standard JAX multi-controller recipe:

* every process calls :func:`initialize_multiprocess` (one coordinator,
  ``jax.distributed.initialize`` underneath) — afterwards ``jax.devices()``
  is the GLOBAL device list and collectives ride the inter-host fabric
  (ICI/DCN on TPU pods, gloo over TCP for the CPU test rig),
* a mesh built over the global devices (:func:`global_mesh`) makes the
  in-process parallel schemes (parallel/data_parallel.py, parallel/spmd.py)
  multi-host: the SAME shard_map train steps run unchanged — each process
  merely feeds the shards it hosts,
* :func:`distribute_batch` lifts host-local stacked arrays (the per-device
  leading axis produced by ``stack_batches`` / ``partition_graph``) into
  global jax.Arrays via ``jax.make_array_from_process_local_data``.

Tested by tests/test_multiprocess.py: two real OS processes, four virtual
CPU devices each, gloo collectives — a DP train step across the process
boundary must produce the same loss/params as one process with all eight
devices (SURVEY §4 multi-process simulation).
"""
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multiprocess(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    cpu_collectives: Optional[str] = "gloo",
) -> None:
    """Join this process into a JAX distributed cluster.

    Must run before any other JAX call in the process. On CPU backends the
    cross-process collectives implementation defaults to gloo (shipped with
    jaxlib); TPU backends ignore ``cpu_collectives`` and use ICI/DCN.
    """
    # No backend queries here — jax.distributed.initialize must run before
    # anything that initialises XLA. The CPU-collectives setting only
    # affects CPU platforms; TPU backends ignore it.
    if cpu_collectives:
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception:  # pragma: no cover - config renamed/absent
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "data",
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over the GLOBAL device list (all processes)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def process_shard_counts(mesh: Mesh) -> Tuple[int, int]:
    """(local device count on the mesh, global device count)."""
    local = sum(1 for d in np.ravel(mesh.devices)
                if d.process_index == jax.process_index())
    return local, np.ravel(mesh.devices).size


def distribute_batch(mesh: Mesh, tree: Any,
                     axis_name="data") -> Any:
    """Lift host-local stacked pytrees into global jax.Arrays.

    Each leaf's leading axis (or axes — pass a TUPLE of axis names for 2-D
    meshes, e.g. ``("data", "nodes")`` for hybrid [R, S, ...] stacks) holds
    this process's LOCAL shards in mesh order; the result is a tree of
    global arrays sharded P(*axis_names) whose global leading dims span the
    full mesh. Feed the result to the unchanged shard_map train/eval steps.
    """
    names = ((axis_name,) if isinstance(axis_name, str)
             else tuple(axis_name))

    def lift(x):
        x = np.asarray(x)
        sharding = NamedSharding(
            mesh, P(*names, *([None] * (x.ndim - len(names)))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(lift, tree)


def replicate_to_mesh(mesh: Mesh, tree: Any) -> Any:
    """Replicate host-local values (params, rng) across every mesh device."""
    def lift(x):
        sharding = NamedSharding(mesh, P())
        return jax.make_array_from_callback(
            np.asarray(x).shape, sharding, lambda idx: np.asarray(x)[idx])

    return jax.tree.map(lift, tree)
