"""One process of the 2-process CPU cluster test (spawned, not collected).

Usage: python multiprocess_worker.py <port> <process_id>

Joins the jax.distributed cluster (gloo CPU collectives), builds the global
8-device mesh (4 virtual devices per process), runs the shared DP + SPMD
workloads feeding only this process's local shards, and prints one JSON
line with the replicated losses/param checksum.
"""
import json
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    port, process_id = sys.argv[1], int(sys.argv[2])
    from tf2_gnn_tpu.parallel import (  # noqa: E402
        distribute_batch,
        global_mesh,
        initialize_multiprocess,
    )

    initialize_multiprocess(f"127.0.0.1:{port}", num_processes=2,
                            process_id=process_id)
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    import mp_workload  # noqa: E402
    from tf2_gnn_tpu.parallel import make_hybrid_mesh  # noqa: E402

    mesh_dp = global_mesh(mp_workload.DP_AXIS)
    mesh_spmd = global_mesh(mp_workload.SPMD_AXIS)
    # 2x4 hybrid over the global devices: row r = process r's 4 devices,
    # so each process feeds exactly its own replica.
    mesh_hybrid = make_hybrid_mesh(2, 4)

    def lift(tree, axis_name):
        # Slice this process's local shards off the full stacked arrays,
        # then assemble the global array (4 local of 8 global shards).
        lo = process_id * 4
        local = jax.tree.map(lambda x: x[lo:lo + 4], tree)
        mesh = mesh_dp if axis_name == mp_workload.DP_AXIS else mesh_spmd
        return distribute_batch(mesh, local, axis_name)

    def lift2d(tree):
        local = jax.tree.map(lambda x: x[process_id:process_id + 1], tree)
        return distribute_batch(mesh_hybrid, local, ("data", "nodes"))

    result = mp_workload.run_steps(mesh_dp, mesh_spmd, lift,
                                   mesh_hybrid=mesh_hybrid, lift2d=lift2d)
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
