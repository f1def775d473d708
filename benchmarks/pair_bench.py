"""Equivalence + timing of the production pair-SpMM module on the TPU.

Runs the bench-shaped PPI workload through ops/pair_spmm.py (planner +
Pallas kernel + custom VJP), checks fwd/bwd against the jnp fallback, and
times both directions with the differenced-chain methodology.

Usage: python benchmarks/pair_bench.py [fwd bwd grad]

NOTE (round 4): this probe uses the per-call chain methodology, which
pays 0.3-1.2 ms of host dispatch per link through the axon tunnel —
fine for trend-tracking multi-ms chains, but for absolute per-kernel
numbers prefer benchmarks/kernel_rebaseline.py (device-chained
fori_loop; see PERFORMANCE.md round-4 methodology correction).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batch  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.kernel_micro import timed
    from tf2_gnn_tpu.ops import pair_spmm as ps

    batch, labels, edges = build_batch(0, use_pallas=False)
    v = batch.num_nodes_padded
    num_types = len(batch.edge_sources)
    rows = num_types * v

    plans = ps.build_pair_plans(
        [np.asarray(s) for s in batch.edge_sources],
        [np.asarray(t) for t in batch.edge_targets],
        [int(c) for c in np.asarray(batch.num_edges)],
        v, overflow_budget=256,
    )
    cf = plans.fwd.rel_src.shape[0]
    cb = plans.bwd.rel_src.shape[0]
    print(f"# V={v} rows={rows} E={edges} fwd_chunks={cf} bwd_chunks={cb} "
          f"fwd_slots/E={cf*ps.E_C/edges:.2f} bwd_slots/E={cb*ps.E_C/edges:.2f}",
          flush=True)

    key = jax.random.PRNGKey(0)
    h = 320
    tables = jax.random.normal(key, (rows, h), jnp.float32).astype(jnp.bfloat16)
    sf = jnp.ones((cf * ps.E_C,), jnp.float32)
    sb = jnp.ones((cb * ps.E_C,), jnp.float32)
    so = (jnp.asarray(plans.ovf_tgt) < v).astype(jnp.float32)
    plan_dev = tuple(jnp.asarray(a) for a in plans.kernel_arrays)

    # Correctness: kernel vs jnp fallback, fwd and grad.
    out_dev = np.asarray(ps.pair_spmm(tables, sf, *plans.fwd, v,
                                      interpret=False))
    out_ref = np.asarray(ps.pair_spmm(tables, sf, *plans.fwd, v,
                                      interpret=True))
    err = np.max(np.abs(out_dev - out_ref)) / (np.max(np.abs(out_ref)) + 1e-9)
    print(f"# fwd kernel vs fallback rel-max err: {err:.2e}", flush=True)

    cot = jax.random.normal(jax.random.PRNGKey(1), (v, h), jnp.float32)

    def loss(t):
        out = ps.pair_typed_gather_scatter(t, sf, sb, so, *plan_dev, v)
        return jnp.vdot(out, cot)

    g_dev = np.asarray(jax.grad(loss)(tables), np.float32)
    g_ref = np.asarray(ps.pair_spmm(cot, sb, *plans.bwd, rows,
                                    interpret=True), np.float32)
    gerr = np.max(np.abs(g_dev - g_ref)) / (np.max(np.abs(g_ref)) + 1e-9)
    print(f"# bwd kernel vs fallback rel-max err: {gerr:.2e}", flush=True)

    def with_force(body):
        def wrapped(o):
            outv = body(o)
            return outv, jnp.sum(outv[0, :8].astype(jnp.float32))
        return jax.jit(wrapped)

    which = sys.argv[1:] or ["fwd", "grad"]
    if "fwd" in which:
        def chain_f(o):
            t = tables + o[0, :1].astype(jnp.bfloat16) * 0
            return ps.pair_spmm(t, sf, *plans.fwd, v, interpret=False)

        dt = timed(with_force(chain_f), jnp.zeros((v, h), jnp.float32))
        print(f"pair fwd  {dt*1e3:8.3f} ms | {edges/dt/1e6:.1f}M edges/s-pass",
              flush=True)
    if "bwd" in which:
        def chain_b(o):
            g = cot + o[0, :1] * 0
            return ps.pair_spmm(g, sb, *plans.bwd, rows, interpret=False)

        dt = timed(with_force(chain_b), jnp.zeros((rows, h), jnp.float32))
        print(f"pair bwd  {dt*1e3:8.3f} ms | {edges/dt/1e6:.1f}M edges/s-pass",
              flush=True)
    if "grad" in which:
        grad_fn = jax.grad(loss)

        def chain_g(o):
            t = tables + o[0, :1].astype(jnp.bfloat16) * 0
            return grad_fn(t)

        dt = timed(with_force(chain_g), jnp.zeros((rows, h), jnp.float32))
        print(f"pair fwd+bwd(grad) {dt*1e3:8.3f} ms | "
              f"{edges/dt/1e6:.1f}M edges/s-pass", flush=True)


if __name__ == "__main__":
    main()
