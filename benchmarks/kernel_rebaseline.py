"""Re-baseline of every hot kernel with the tunnel-proof methodology
(kernel_micro.device_chain_timed — on-device fori_loop chaining).

Round-4 finding: the per-call chain methodology pays 0.3-1.2 ms of host
dispatch per link through the axon tunnel, so every sub-2-ms per-kernel
number in earlier rounds was dispatch-inflated. This script produces the
corrected per-invocation device times for the PPI bench shape and prints
one JSON line per kernel. Run on a quiet host.
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batch  # noqa: E402
from benchmarks.kernel_micro import device_chain_timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from tf2_gnn_tpu.ops import pair_attention as pa
    from tf2_gnn_tpu.ops import pair_edge_mlp as pem
    from tf2_gnn_tpu.ops import pair_spmm as ps

    batch, _, edges = build_batch(0, use_pallas=False,
                                  pair_merge_targets=True, use_pairs=True)
    v = batch.num_nodes_padded
    num_types = batch.num_edge_types
    rows = num_types * v
    k, h = 4, 320

    plans = ps.build_pair_plans(
        [np.asarray(s) for s in batch.edge_sources],
        [np.asarray(t) for t in batch.edge_targets],
        [int(c) for c in np.asarray(batch.num_edges)], v,
        overflow_budget=256)
    merged = ps.PairPlans.fromtuple(batch.pair_plans)
    cf = plans.fwd.rel_src.shape[0]
    cb = plans.bwd.rel_src.shape[0]
    print(f"# V={v} rows={rows} E={edges} fwd_chunks={cf} bwd_chunks={cb}",
          flush=True)

    table = jax.random.normal(jax.random.PRNGKey(0), (rows, h), jnp.float32
                              ).astype(jnp.bfloat16)
    scores = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (rows, 2 * k),
                                      jnp.float32)).astype(jnp.bfloat16)
    plan_dev = tuple(jnp.asarray(a) for a in plans.kernel_arrays)
    cot_w = jax.random.normal(jax.random.PRNGKey(2), (v, h), jnp.float32)
    cot_d = jax.random.normal(jax.random.PRNGKey(3), (v, k), jnp.float32)
    cot_t = jax.random.normal(jax.random.PRNGKey(4), (rows, h), jnp.float32)

    def emit(name, body, extra=None):
        ms = device_chain_timed(body, table)
        row = {"kernel": name, "ms": round(ms, 3)}
        row.update(extra or {})
        print(json.dumps(row), flush=True)

    # --- pair SpMM (joint sum over all types) -----------------------------
    sf, sb, so = ps.pair_unit_scales(plans.astuple(), v)

    def spmm_fwd(t):
        out = ps.pair_typed_gather_scatter(t, sf, sb, so,
                                           *plans.kernel_arrays, v)
        return jnp.pad(out, ((0, rows - v), (0, 0)))

    def spmm_grad(t):
        # QUADRATIC loss: a linear vdot lets XLA DCE the forward kernel out
        # of the custom-VJP chain (the op is linear in its tables), so the
        # "fwd+bwd" row would time the backward alone (r2c finding).
        f = lambda x: jnp.sum(jnp.square(ps.pair_typed_gather_scatter(
            x, sf, sb, so, *plans.kernel_arrays, v)))
        return jax.grad(f)(t)

    emit("pair_spmm fwd", spmm_fwd,
         {"raw_mxu_ms": round(cf * 2 * 128**3 * 2 / 197e12 * 1e3, 3)})
    emit("pair_spmm fwd+bwd", spmm_grad,
         {"raw_mxu_ms": round((cf + cb) * 2 * 128**3 * 2 / 197e12 * 1e3,
                              3)})

    # --- edge-MLP pair kernel (merged-target plans) -----------------------
    msf, msb, mso = ps.pair_unit_scales(batch.pair_plans, rows)
    mplans = batch.pair_plans

    def emlp_fwd(t):
        return pem.pair_relu_mlp_aggregate(t, t, msf, msb, mso,
                                           *mplans[:10], rows)

    def emlp_grad(t):
        f = lambda x: jnp.vdot(pem.pair_relu_mlp_aggregate(
            x, x, msf, msb, mso, *mplans[:10], rows), cot_t)
        return jax.grad(f)(t)

    mcf = np.asarray(mplans[2]).shape[0]
    mcb = np.asarray(mplans[6]).shape[0]
    emit("pair_edge_mlp fwd", emlp_fwd,
         {"chunks": int(mcf),
          "raw_mxu_ms": round(mcf * 3 * 128**3 * 2 / 197e12 * 1e3, 3)})
    emit("pair_edge_mlp fwd+bwd", emlp_grad,
         {"raw_mxu_ms": round((4 * mcf + 4 * mcb) * 128**3 * 2 / 197e12
                              * 1e3, 3)})

    # --- flash pair attention --------------------------------------------
    def attn_fwd(t):
        d, w = pa.pair_attention(t, scores, *plan_dev, v, k, "bound")
        return jnp.pad(w, ((0, rows - v), (0, 0)))

    def attn_grad(t):
        def loss(tt, ss):
            d, w = pa.pair_attention(tt, ss, *plan_dev, v, k, "bound")
            return jnp.vdot(w, cot_w) + jnp.vdot(d, cot_d)
        return jax.grad(loss, argnums=0)(t, scores)

    # fwd: expd sweep (~2 passes/chunk) + K head-major launches (2
    # passes/chunk each); bwd: the fused kernel's 14 tile passes/chunk.
    emit("pair_attention fwd", attn_fwd,
         {"raw_mxu_ms": round(cf * (2 + 2 * k) * 128**3 * 2 / 197e12 * 1e3,
                              3)})
    emit("pair_attention fwd+bwd", attn_grad,
         {"raw_mxu_ms": round((cf * (2 + 2 * k) + cb * 14) * 128**3 * 2
                              / 197e12 * 1e3, 3)})


if __name__ == "__main__":
    main()
