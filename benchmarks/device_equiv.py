"""Run the TPU-gated kernel-equivalence tests ON HARDWARE.

Under pytest these tests always skip: tests/conftest.py forces the CPU
platform (so CI is deterministic with or without a chip) and the
``skipif(default_backend != "tpu")`` gate then never opens. This driver
imports the same test FUNCTIONS and runs them against the real device —
the runbook's kernel-equivalence stage calls this, not pytest.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    import jax

    backend = jax.default_backend()
    if backend != "tpu":
        raise SystemExit(f"need the TPU backend, got {backend!r}")

    import numpy as np

    import test_pair_attention as tpa
    import test_pair_edge_mlp as tpe
    import test_pair_spmm as tps

    for name, fn in (
        ("pair_attention device twins",
         tpa.test_pair_attention_kernels_match_twins_on_tpu),
        ("pair_spmm device twin",
         tps.test_pair_kernel_matches_fallback_on_tpu),
        ("pair_edge_mlp device twins (fwd/dB/dA)",
         tpe.test_pair_edge_mlp_kernels_match_twins_on_tpu),
        ("pair_spmm streamed-typed device twin",
         tps.test_streamed_kernel_matches_twin_on_tpu),
        ("pair_spmm JOINT-window device twin",
         tps.test_joint_stream_kernel_matches_twin_on_tpu),
        ("pair_attention ext src_space on device", _ext_src_space_check),
    ):
        np.random.seed(0)
        fn()
        print(f"{name}: PASS", flush=True)


def _ext_src_space_check():
    """SPMD-halo form on hardware: sources in the ext row space
    [local | halo], targets local — device kernels vs the interpret twins
    at src_space > num_nodes (the composition the CPU suite can only prove
    through the jnp twins)."""
    import jax.numpy as jnp
    import numpy as np

    from tf2_gnn_tpu.ops import pair_attention as pa
    from tf2_gnn_tpu.ops import pair_spmm as ps

    rng = np.random.RandomState(3)
    v, vs, num_types, k, head_dim = 256, 384, 3, 4, 16
    srcs, tgts, counts = [], [], []
    for _ in range(num_types):
        e = 900
        src = rng.randint(0, vs, e).astype(np.int32)
        tgt = rng.randint(0, v, e).astype(np.int32)
        budget = ((e + 63) // 64) * 64
        s = np.full((budget,), vs - 1, np.int32)
        t = np.full((budget,), v - 1, np.int32)
        s[:e], t[:e] = src, tgt
        srcs.append(s)
        tgts.append(t)
        counts.append(e)
    plans = ps.build_pair_plans(srcs, tgts, counts, v, src_space=vs)
    rows = num_types * vs
    table = jnp.asarray(rng.randn(rows, head_dim * k).astype(np.float32))
    scores = jnp.asarray((0.5 * rng.randn(rows, 2 * k)).astype(np.float32))
    args = plans.kernel_arrays

    m_d = pa.pair_attention_max(scores, *args[:4], v, k, interpret=False,
                                src_space=vs)
    m_r = pa.pair_attention_max(scores, *args[:4], v, k, interpret=True,
                                src_space=vs)
    np.testing.assert_allclose(np.asarray(m_d), np.asarray(m_r),
                               rtol=1e-5, atol=1e-5)
    m_safe = pa._stabilise(m_d, scores.dtype)
    e_d, _ = pa.pair_attention_expd(scores, m_safe, *args[:4], v, k,
                                    interpret=False, with_slope=False,
                                    src_space=vs)
    e_r, _ = pa.pair_attention_expd(scores, m_safe, *args[:4], v, k,
                                    interpret=True, with_slope=False,
                                    src_space=vs)
    np.testing.assert_allclose(np.asarray(e_d), np.asarray(e_r),
                               rtol=1e-4, atol=1e-5)
    dw = jnp.asarray(rng.randn(v, head_dim * k).astype(np.float32))
    dd = jnp.asarray(rng.randn(v, k).astype(np.float32))
    d3 = pa.pair_attention_bwd_fused(table, dw, dd, scores, m_safe,
                                     *args[4:8], v, k, interpret=False,
                                     src_space=vs)
    r3 = pa.pair_attention_bwd_fused(table, dw, dd, scores, m_safe,
                                     *args[4:8], v, k, interpret=True,
                                     src_space=vs)
    for name, x, y in zip(("d_ss", "d_ts", "d_table"), d3, r3):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


if __name__ == "__main__":
    main()
