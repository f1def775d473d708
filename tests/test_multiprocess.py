"""Multi-process execution path: 2 real OS processes, one JAX cluster.

SURVEY §4's multi-process simulation: the same shard_map DP and SPMD train
steps must work when the 8-device mesh spans a process boundary (4 virtual
CPU devices per process, gloo collectives over localhost), and produce the
same results as a single process holding all 8 devices.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from . import mp_workload


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference():
    """Ground truth: same workloads on this process's 8 virtual devices."""
    from tf2_gnn_tpu.parallel import global_mesh, make_hybrid_mesh

    mesh_dp = global_mesh(mp_workload.DP_AXIS)
    mesh_spmd = global_mesh(mp_workload.SPMD_AXIS)
    return mp_workload.run_steps(mesh_dp, mesh_spmd,
                                 lambda tree, axis: tree,
                                 mesh_hybrid=make_hybrid_mesh(2, 4),
                                 lift2d=lambda tree: tree)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_cluster_matches_single_process():
    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multiprocess_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))

    # Both processes observe the same replicated metrics: DP, SPMD on the
    # dense all_to_all form, SPMD on the ring form RIDING THE PAIR KERNELS,
    # and the hybrid 2x4 mesh (each process feeding its own replica).
    keys = ("dp_loss", "spmd_loss", "spmd_ring_pair_loss",
            "spmd_typed_pair_loss", "hybrid_loss",
            "checksum")
    for key in keys:
        np.testing.assert_allclose(results[0][key], results[1][key],
                                   rtol=1e-6, err_msg=key)

    ref = _reference()
    for key in keys:
        np.testing.assert_allclose(results[0][key], ref[key],
                                   rtol=1e-4, err_msg=key)
