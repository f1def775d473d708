"""Property-based fuzz of the block-pair planner + kernel twins.

The targeted tests pin known shapes; this sweep drives randomized and
DEGENERATE graphs (empty edge types, single-block node spaces, one hot
target row, self-loop-only, near-empty) through plan building and the
three kernel families' jnp twins, checking against dense numpy references.
Catches planner edge cases (sentinel handling, run alignment, overflow
spill, merged-target globalization) that shaped workloads never hit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.ops import pair_spmm as ps


def _case(rng, kind, v, num_types):
    srcs, tgts, counts = [], [], []
    for t in range(num_types):
        if kind == "empty" or (kind == "mixed" and t == 0):
            e = 0
        elif kind == "tiny":
            e = rng.randint(1, 4)
        elif kind == "hot_target":
            e = rng.randint(64, 400)
        else:
            e = rng.randint(1, v * 4)
        budget = max(((e + 63) // 64) * 64, 64)
        s = np.full((budget,), v - 1, np.int64)
        g = np.full((budget,), v - 1, np.int64)
        if kind == "selfloop":
            e = min(e, v)
            nodes = rng.choice(v, size=e, replace=False)
            s[:e] = nodes
            g[:e] = nodes
        elif kind == "hot_target":
            s[:e] = rng.randint(0, v, e)
            g[:e] = rng.randint(0, max(v // 64, 1))  # one (or few) hot rows
        else:
            s[:e] = rng.randint(0, v, e)
            g[:e] = rng.randint(0, v, e)
        srcs.append(s)
        tgts.append(g)
        counts.append(e)
    return srcs, tgts, counts


KINDS = ("random", "empty", "mixed", "tiny", "hot_target", "selfloop")


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_joint_and_merged_plans(kind, seed):
    rng = np.random.RandomState(seed * 101 + hash(kind) % 1000)
    v = int(rng.choice([128, 256, 384]))
    num_types = int(rng.choice([1, 2, 3]))
    h = 8
    srcs, tgts, counts = _case(rng, kind, v, num_types)
    tables = rng.randn(num_types * v, h).astype(np.float32)

    dense = np.zeros((v, h), np.float64)
    for l in range(num_types):
        c = counts[l]
        np.add.at(dense, tgts[l][:c], tables[l * v + srcs[l][:c]])

    # Joint plans.
    plans = ps.build_pair_plans(srcs, tgts, counts, v, overflow_budget=64,
                                overflow_size=64)
    sf, sb, so = ps.pair_unit_scales(plans.astuple(), v)
    out = ps.pair_typed_gather_scatter(jnp.asarray(tables), sf, sb, so,
                                       *plans.kernel_arrays, v)
    np.testing.assert_allclose(np.asarray(out), dense, rtol=2e-4, atol=2e-4)

    # Merged-target plans -> per-type aggregates summing to the joint.
    merged = ps.build_pair_plans(srcs, tgts, counts, v, merge_targets=True,
                                 overflow_budget=64, overflow_size=64)
    mf, mb, mo = ps.pair_unit_scales(merged.astuple(), num_types * v)
    out_m = ps.pair_typed_gather_scatter(
        jnp.asarray(tables), mf, mb, mo, *merged.kernel_arrays,
        num_types * v)
    np.testing.assert_allclose(
        np.asarray(out_m).reshape(num_types, v, h).sum(axis=0), dense,
        rtol=2e-4, atol=2e-4)

    # Gradients agree with XLA autodiff of the dense formulation.
    cot = jnp.asarray(rng.randn(v, h).astype(np.float32))

    def via_plans(t):
        return jnp.vdot(ps.pair_typed_gather_scatter(
            t, sf, sb, so, *plans.kernel_arrays, v), cot)

    def via_xla(t):
        acc = jnp.zeros((v, h))
        for l in range(num_types):
            c = counts[l]
            if c:
                acc = acc + jax.ops.segment_sum(
                    jnp.take(t, l * v + srcs[l][:c], axis=0),
                    tgts[l][:c], num_segments=v)
        return jnp.vdot(acc, cot)

    g_p = jax.grad(via_plans)(jnp.asarray(tables))
    g_x = jax.grad(via_xla)(jnp.asarray(tables))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("kind", KINDS)
def test_fuzz_streamed_typed_plans(kind):
    """The streamed (single-launch row-split) form on the same degenerate
    cases — per-type plans with zero-edge types concatenate and match the
    dense reference."""
    rng = np.random.RandomState(hash(kind) % 1000)
    v, num_types, h = 256, 3, 8
    srcs, tgts, counts = _case(rng, kind, v, num_types)
    plans_typed = tuple(
        ps.build_pair_plans([srcs[t]], [tgts[t]], [counts[t]], v,
                            group_fwd=8, group_bwd=8,
                            overflow_budget=64, overflow_size=64).astuple()
        for t in range(num_types)
    )
    tables = rng.randn(num_types * v, h).astype(np.float32)
    out = ps.pair_stream_from_typed(jnp.asarray(tables), plans_typed, v,
                                    normalize=False)
    expected = np.zeros((num_types * v, h), np.float64)
    for l in range(num_types):
        c = counts[l]
        np.add.at(expected, l * v + tgts[l][:c], tables[l * v + srcs[l][:c]])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("kind", KINDS)
def test_fuzz_edge_mlp_pair_kernel(kind):
    """The target-state edge-MLP op on merged plans over the same cases:
    relu-MLP aggregates match a dense reference, including all-empty and
    one-hot-row structures."""
    from tf2_gnn_tpu.ops import pair_edge_mlp as pem

    rng = np.random.RandomState(hash(kind) % 997)
    v, num_types, h = 256, 2, 8
    srcs, tgts, counts = _case(rng, kind, v, num_types)
    merged = ps.build_pair_plans(srcs, tgts, counts, v, merge_targets=True,
                                 overflow_budget=64, overflow_size=64)
    a = rng.randn(num_types * v, h).astype(np.float32)
    b = rng.randn(num_types * v, h).astype(np.float32)
    t = merged.astuple()
    scales = ps.pair_unit_scales(t, num_types * v)
    out = pem.pair_relu_mlp_aggregate(
        jnp.asarray(a), jnp.asarray(b), *scales, *t[:10], num_types * v)
    expected = np.zeros((num_types * v, h), np.float64)
    for l in range(num_types):
        c = counts[l]
        rows = l * v + tgts[l][:c]
        np.add.at(expected, rows,
                  np.maximum(a[l * v + srcs[l][:c]].astype(np.float64)
                             + b[rows], 0.0))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=2e-4)
