"""Per-kernel timing of the flash pair-attention pipeline on the TPU.

Splits the RGAT fused path into its launches (max kernel, aggregation
sweep, fused backward) at the bench shape so regressions can be blamed on
a specific kernel rather than the whole step. DEVICE-CHAINED methodology
(kernel_micro.device_chain_timed): a round-4 control showed the old
per-call chaining pays 0.3-1.2 ms of host dispatch per link through the
axon tunnel, which swamps sub-ms kernels — values reported by earlier
rounds' runs of this probe were dispatch-inflated. Usage:

    python benchmarks/attention_probe.py [max expd agg hm fwd grad]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batch  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.kernel_micro import device_chain_timed
    from tf2_gnn_tpu.ops import pair_attention as pa
    from tf2_gnn_tpu.ops import pair_spmm as ps

    import os

    batch, labels, edges = build_batch(0, use_pallas=False)
    v = batch.num_nodes_padded
    num_types = len(batch.edge_sources)
    rows = num_types * v
    k = int(os.environ.get("PROBE_HEADS", "4"))
    h = 320

    plans = ps.build_pair_plans(
        [np.asarray(s) for s in batch.edge_sources],
        [np.asarray(t) for t in batch.edge_targets],
        [int(c) for c in np.asarray(batch.num_edges)],
        v, overflow_budget=256,
    )
    cf = plans.fwd.rel_src.shape[0]
    cb = plans.bwd.rel_src.shape[0]
    print(f"# V={v} rows={rows} E={edges} fwd_chunks={cf} bwd_chunks={cb}",
          flush=True)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows, h), jnp.float32).astype(jnp.bfloat16)
    scores = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (rows, 2 * k),
                                      jnp.float32)).astype(jnp.bfloat16)
    plan_dev = tuple(jnp.asarray(a) for a in plans.kernel_arrays)
    fwd_plan = plan_dev[:4]
    ovf_src, ovf_tgt = plan_dev[8], plan_dev[9]

    def padded(body):
        """Chain bodies through a [rows, h]-shaped carrier (pad/trim so
        device_chain_timed can feed any stage's output back as data)."""
        def wrapped(t):
            out = body(t)
            out = out.reshape(out.shape[0], -1).astype(jnp.float32)
            pr = rows - out.shape[0]
            pc = h - out.shape[1]
            if pr or pc:
                out = jnp.pad(out[:rows, :h], ((0, max(pr, 0)),
                                               (0, max(pc, 0))))
            return out
        return wrapped

    maxes = pa._launch_max(scores, fwd_plan, ovf_src, ovf_tgt, v, k)
    m_safe = pa._stabilise(maxes, scores.dtype)
    m_safe = jax.block_until_ready(m_safe)

    which = sys.argv[1:] or ["max", "expd", "agg", "hm", "fwd", "grad"]
    if "max" in which:
        def chain_m(t):
            s = scores + t[0, :1].astype(scores.dtype) * 0
            return pa.pair_attention_max(s, *fwd_plan, v, k)

        dt = device_chain_timed(padded(chain_m), table) / 1e3
        print(f"attn max        {dt*1e3:8.3f} ms", flush=True)
    expd_f, _ = pa.pair_attention_expd(scores, m_safe, *fwd_plan, v, k)
    expd_f = jax.block_until_ready(expd_f)
    if "expd" in which:
        def chain_e(t):
            s = scores + t[0, :1].astype(scores.dtype) * 0
            return pa.pair_attention_expd(s, m_safe, *fwd_plan, v, k)[0].T

        dt = device_chain_timed(padded(chain_e), table) / 1e3
        print(f"attn expd       {dt*1e3:8.3f} ms", flush=True)
    if "agg" in which:
        def chain_a(t):
            return pa.pair_attention_agg(t, expd_f.T, *fwd_plan,
                                         v, k)[1][:, :h]

        dt = device_chain_timed(padded(chain_a), table) / 1e3
        print(f"attn agg        {dt*1e3:8.3f} ms", flush=True)
    if "hm" in which:
        # Head-major K-launch pair_spmm alternative to the agg kernel
        # (pair_attention.py::_headmajor_sums) at the same inputs.
        def chain_h(t):
            return pa._headmajor_sums(t, expd_f, fwd_plan, v, k)[1][:, :h]

        dt = device_chain_timed(padded(chain_h), table) / 1e3
        print(f"attn headmajor  {dt*1e3:8.3f} ms", flush=True)
    # Stabiliser of the composed forward/grad stages (PROBE_STABILISER:
    # "exact" = max kernel pass, "bound" = node-space bound, the production
    # default — see pair_attention.py::_bound_stabiliser).
    stab = os.environ.get("PROBE_STABILISER", "bound")
    if "fwd" in which:
        def chain_f(t):
            return pa.pair_attention(t, scores, *plan_dev, v, k, stab)[1]

        dt = device_chain_timed(padded(chain_f), table) / 1e3
        print(f"attn fwd ({stab}) {dt*1e3:8.3f} ms", flush=True)
    if "grad" in which:
        cot_w = jax.random.normal(jax.random.PRNGKey(2), (v, h), jnp.float32)
        cot_d = jax.random.normal(jax.random.PRNGKey(3), (v, k), jnp.float32)

        def loss(t, s):
            denom, weighted = pa.pair_attention(t, s, *plan_dev, v, k, stab)
            # Quadratic terms make the cotangents depend on the forward
            # outputs, so XLA cannot dead-code-eliminate the forward
            # kernels out of the gradient chain (with linear vdot losses
            # the cotangents are constants and the agg kernel vanishes —
            # measured 6.2 ms "fwd+bwd" vs 15.9 ms fwd-alone).
            return (jnp.vdot(weighted, weighted * cot_w)
                    + jnp.vdot(denom, denom * cot_d))

        grad_fn = jax.grad(loss, argnums=(0, 1))

        def chain_g(t):
            return grad_fn(t, scores)[0]

        dt = device_chain_timed(padded(chain_g), table) / 1e3
        print(f"attn fwd+bwd ({stab}) {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
