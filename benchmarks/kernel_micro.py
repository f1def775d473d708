"""Component microbenchmark for the fused message-passing pipeline.

Times, on the real chip with the bench.py methodology (data-dependent
chaining + scalar host-transfer forcing + differenced loop lengths):

* the XLA row gather (`jnp.take`) feeding the scatter kernel, bf16 and f32,
* the same gather with target-sorted (plan-ordered) vs source-sorted indices,
* the Pallas sorted one-hot scatter alone,
* the full fused gather+scatter custom-vjp primitive,
* a dense matmul of equivalent FLOPs for calibration.

Run on a quiet host: `python benchmarks/kernel_micro.py`.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batch  # noqa: E402

H = 320
L = 3


def device_chain_timed(body, seed, n1=4, n2=16, reps=2):
    """DEVICE-side chaining: ``body(x) -> array`` is iterated inside ONE
    jitted ``fori_loop`` (data-dependent through a 1e-12-scaled add, so
    XLA can neither CSE nor reorder the iterations), and two trip counts
    are differenced. This is the only per-kernel methodology that holds up
    through the axon tunnel: per-CALL chaining (``timed`` below) pays a
    0.3-1.2 ms host dispatch per link, which swamps sub-ms kernels — a
    round-4 control measured a bare copy ("noop") at 1.21 ms while the
    bound stabiliser it was supposed to dwarf measured 0.31 ms. Returns
    ms per body invocation."""
    import time as _time
    from functools import partial

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=1)
    def many(x, n):
        def step(i, x):
            return (x + 1e-12 * body(x).astype(x.dtype)).astype(x.dtype)
        return jax.lax.fori_loop(0, n, step, x).sum()

    float(np.asarray(many(seed, n1)))
    float(np.asarray(many(seed, n2)))
    best = None
    for _ in range(reps):
        t0 = _time.perf_counter()
        float(np.asarray(many(seed, n1)))
        t1 = _time.perf_counter()
        float(np.asarray(many(seed, n2)))
        t2 = _time.perf_counter()
        cur = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        best = cur if best is None else min(best, cur)
    return best


def timed(fn, seed_chain, base=6, full=18):
    """fn(chain) -> (chain_out, force_scalar); ONE jit entry, the forcing
    scalar is produced in-jit so host-side sync is a bare 4-byte transfer.

    CAVEAT (round 4): each chain link is a separate host dispatch; through
    the axon tunnel that costs 0.3-1.2 ms PER LINK, so values below ~2 ms
    are dispatch-bound, not kernel-bound. Prefer ``device_chain_timed``
    for per-kernel numbers; this form remains fine for multi-ms components
    (full train steps)."""
    out, scalar = fn(seed_chain)  # compile + warm
    out, scalar = fn(out)
    # Force completion of compile + warmup before timing (the tunnel's
    # dispatch is deeply asynchronous; see PERFORMANCE.md methodology).
    _ = float(np.asarray(scalar))

    def run(n):
        start = time.perf_counter()
        o, s = out, scalar
        for _ in range(n):
            o, s = fn(o)
        _ = float(np.asarray(s))
        return time.perf_counter() - start

    t_base = run(base)
    t_full = run(full)
    return (t_full - t_base) / (full - base)


def main():
    import jax
    import jax.numpy as jnp

    from tf2_gnn_tpu.ops import spmm_pallas as sp

    batch, labels, edges = build_batch(0)
    plans = sp.MergedScatterPlan(*batch.scatter_plans)
    v = batch.num_nodes_padded
    slots = plans.src_merged.shape[0]
    print(f"# V={v} L={L} H={H} real_edges={edges} fwd_slots={slots}", flush=True)

    # Only the small int32 plan arrays cross the (slow) host->device tunnel;
    # all float payloads are generated on device.
    key = jax.random.PRNGKey(0)
    tables_f32 = jax.random.normal(key, (L * v, H), jnp.float32)
    tables_bf16 = tables_f32.astype(jnp.bfloat16)
    src = jnp.asarray(plans.src_merged)
    src_sorted = jnp.asarray(np.sort(np.asarray(plans.src_merged)))
    rel_tgt = jnp.asarray(plans.rel_tgt)
    tgt_blocks = jnp.asarray(plans.tgt_blocks)
    scale = jnp.ones((slots,), jnp.float32)
    msgs_bf16 = jax.random.normal(
        jax.random.PRNGKey(1), (slots, H), jnp.float32
    ).astype(jnp.bfloat16)

    def chain_idx(idx, o):
        return idx + (o.ravel()[0] * 0).astype(jnp.int32)

    n = 2048
    a = jax.random.normal(jax.random.PRNGKey(2), (n, n)).astype(jnp.bfloat16)

    def with_force(body):
        """body(chain_array) -> out_array; returns jitted
        chain -> (out, in-jit forcing scalar)."""

        def wrapped(o):
            out = body(o)
            return out, jnp.sum(out[0, :8].astype(jnp.float32))

        return jax.jit(wrapped)

    variants = {
        "take_bf16_planorder": (
            with_force(lambda o: jnp.take(tables_bf16, chain_idx(src, o),
                                          axis=0, mode="clip")),
            msgs_bf16,
            lambda dt: f" | payload {slots*H*2/dt/1e9:.0f} GB/s",
        ),
        "take_bf16_sorted": (
            with_force(lambda o: jnp.take(tables_bf16, chain_idx(src_sorted, o),
                                          axis=0, mode="clip")),
            msgs_bf16,
            lambda dt: f" | payload {slots*H*2/dt/1e9:.0f} GB/s",
        ),
        "take_f32_planorder": (
            with_force(lambda o: jnp.take(tables_f32, chain_idx(src, o), axis=0,
                                          mode="clip")),
            msgs_bf16.astype(jnp.float32),
            lambda dt: f" | payload {slots*H*4/dt/1e9:.0f} GB/s",
        ),
        "scatter_only_bf16": (
            with_force(lambda o: sp.sorted_segment_sum_scaled(
                msgs_bf16, scale + o.ravel()[0] * 0, rel_tgt, tgt_blocks, v,
                interpret=False)),
            jnp.zeros((v, H), jnp.float32),
            lambda dt: f" | msgs read {slots*H*2/dt/1e9:.0f} GB/s",
        ),
        "fused_take_scatter": (
            with_force(lambda o: sp.sorted_segment_sum_scaled(
                jnp.take(tables_bf16, chain_idx(src, o), axis=0, mode="clip"),
                scale, rel_tgt, tgt_blocks, v, interpret=False)),
            jnp.zeros((v, H), jnp.float32),
            lambda dt: f" | {edges/dt/1e6:.1f}M edges/s-pass",
        ),
        "matmul_2048_bf16": (
            with_force(lambda o: (a + o.ravel()[0] * 0) @ a),
            a,
            lambda dt: f" | {2*n**3/dt/1e12:.1f} TFLOP/s",
        ),
    }
    names = sys.argv[1:] or list(variants)
    for name in names:
        fn, seed, fmt = variants[name]
        dt = timed(fn, seed)
        print(f"{name:24s} {dt*1e3:8.3f} ms{fmt(dt)}", flush=True)


if __name__ == "__main__":
    main()
