"""Block-pair SpMM planner + fallback + VJP equivalence (ops/pair_spmm.py).

CPU tests exercise the planner and the jnp fallback (the Pallas kernel is
numerically equivalence-tested on TPU hardware — see benchmarks/pair_probe.py
and the TPU-gated test at the bottom).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.ops import pair_spmm as ps


def _random_edges(rng, num_types, v, avg_deg=6, clusters=True):
    """Random per-type edge lists; with clusters=True, block-diagonal-ish
    (like packed disconnected graphs)."""
    srcs, tgts, counts = [], [], []
    for _ in range(num_types):
        e = rng.randint(v // 2, v * avg_deg)
        if clusters:
            centers = rng.randint(0, v, max(e // 50, 1))
            base = centers[rng.randint(0, len(centers), e)]
            src = np.clip(base + rng.randint(-64, 64, e), 0, v - 1)
            tgt = np.clip(base + rng.randint(-64, 64, e), 0, v - 1)
        else:
            src = rng.randint(0, v, e)
            tgt = rng.randint(0, v, e)
        budget = ((e + 63) // 64) * 64
        s = np.full((budget,), v - 1, np.int32)
        t = np.full((budget,), v - 1, np.int32)
        s[:e], t[:e] = src, tgt
        srcs.append(s)
        tgts.append(t)
        counts.append(e)
    return srcs, tgts, counts


def _reference(tables, srcs, tgts, counts, scale_full, v):
    """Plain XLA semantics: sum over real edges of scale * tables[l*V+u]."""
    out = np.zeros((v, tables.shape[1]), np.float64)
    for l, (s, t, c) in enumerate(zip(srcs, tgts, counts)):
        rows = np.asarray(tables, np.float64)[l * v + s[:c]]
        w = scale_full[l * v + t[:c]]
        np.add.at(out, t[:c], rows * w[:, None])
    return out


def _scales_for(plans_tuple, inv_flat, v, src_space):
    """Per-slot scales for both directions + overflow (1/deg-style lookup)."""
    plans = ps.PairPlans.fromtuple(plans_tuple)
    inv = jnp.asarray(inv_flat)

    srcabs, tgtabs, valid = ps.pair_slot_abs_ids(plans_tuple, "fwd")
    ltype = srcabs // src_space
    scale_fwd = jnp.take(inv, ltype * v + tgtabs, mode="clip") * valid

    srcabs_b, tgtabs_b, valid_b = ps.pair_slot_abs_ids(plans_tuple, "bwd")
    ltype_b = tgtabs_b // src_space
    scale_bwd = jnp.take(inv, ltype_b * v + srcabs_b, mode="clip") * valid_b

    ovf_src = jnp.asarray(plans.ovf_src)
    ovf_tgt = jnp.asarray(plans.ovf_tgt)
    ovf_valid = (ovf_tgt < v).astype(jnp.float32)
    ovf_l = ovf_src // src_space
    ovf_scale = jnp.take(inv, ovf_l * v + jnp.minimum(ovf_tgt, v - 1),
                         mode="clip") * ovf_valid
    return scale_fwd, scale_bwd, ovf_scale


@pytest.mark.parametrize("clusters", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_pair_plan_fwd_matches_reference(seed, clusters):
    rng = np.random.RandomState(seed)
    v, num_types, h = 512, 3, 24
    srcs, tgts, counts = _random_edges(rng, num_types, v, clusters=clusters)
    plans = ps.build_pair_plans(srcs, tgts, counts, v)
    tables = rng.randn(num_types * v, h).astype(np.float32)
    scale_full = (0.5 + rng.rand(num_types * v)).astype(np.float32)

    sf, sb, so = _scales_for(plans.astuple(), scale_full, v, v)
    out = ps.pair_typed_gather_scatter(
        jnp.asarray(tables), sf, sb, so, *plans.kernel_arrays, v
    )
    ref = _reference(tables, srcs, tgts, counts, scale_full, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pair_plan_gradient_matches_xla():
    rng = np.random.RandomState(7)
    v, num_types, h = 384, 2, 16
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans = ps.build_pair_plans(srcs, tgts, counts, v)
    tables = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))
    scale_full = (0.5 + rng.rand(num_types * v)).astype(np.float32)
    sf, sb, so = _scales_for(plans.astuple(), scale_full, v, v)
    cot = jnp.asarray(rng.randn(v, h).astype(np.float32))

    def via_pairs(t):
        out = ps.pair_typed_gather_scatter(t, sf, sb, so, *plans.kernel_arrays, v)
        return jnp.vdot(out, cot)

    def via_xla(t):
        acc = jnp.zeros((v, h))
        for l in range(num_types):
            c = counts[l]
            rows = jnp.take(t, l * v + srcs[l][:c], axis=0, mode="clip")
            w = jnp.take(jnp.asarray(scale_full), l * v + tgts[l][:c],
                         mode="clip")
            acc = acc + jax.ops.segment_sum(
                rows * w[:, None], tgts[l][:c], num_segments=v
            )
        return jnp.vdot(acc, cot)

    g_pairs = jax.grad(via_pairs)(tables)
    g_xla = jax.grad(via_xla)(tables)
    np.testing.assert_allclose(np.asarray(g_pairs), np.asarray(g_xla),
                               rtol=2e-4, atol=2e-4)


def test_pair_plan_overflow_spill_exact():
    """A tiny chunk budget forces spilling; result must stay exact."""
    rng = np.random.RandomState(3)
    v, num_types, h = 512, 2, 8
    srcs, tgts, counts = _random_edges(rng, num_types, v, clusters=False)
    total = sum(counts)
    plans = ps.build_pair_plans(
        srcs, tgts, counts, v,
        chunk_budget_fwd=ps.GROUP * 2, chunk_budget_bwd=ps.GROUP * 2,
        overflow_budget=((total + 63) // 64) * 64,
    )
    assert int(np.sum(np.asarray(plans.ovf_tgt) < v)) > 0  # actually spilled
    tables = rng.randn(num_types * v, h).astype(np.float32)
    scale_full = np.ones((num_types * v,), np.float32)
    sf, sb, so = _scales_for(plans.astuple(), scale_full, v, v)
    out = ps.pair_typed_gather_scatter(
        jnp.asarray(tables), sf, sb, so, *plans.kernel_arrays, v
    )
    ref = _reference(tables, srcs, tgts, counts, scale_full, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pair_plan_overflow_budget_error():
    rng = np.random.RandomState(4)
    v = 512
    srcs, tgts, counts = _random_edges(rng, 1, v, clusters=False)
    with pytest.raises(ValueError, match="overflow budget"):
        ps.build_pair_plans(srcs, tgts, counts, v,
                            chunk_budget_fwd=ps.GROUP,
                            chunk_budget_bwd=ps.GROUP,
                            overflow_budget=8)


def test_pair_plan_empty_edges():
    v, h = 256, 8
    srcs = [np.full((64,), v - 1, np.int32)]
    tgts = [np.full((64,), v - 1, np.int32)]
    plans = ps.build_pair_plans(srcs, tgts, [0], v)
    tables = jnp.asarray(np.random.randn(v, h).astype(np.float32))
    zeros = jnp.zeros((plans.fwd.rel_src.size,), jnp.float32)
    zeros_b = jnp.zeros((plans.bwd.rel_src.size,), jnp.float32)
    ovf0 = jnp.zeros((plans.ovf_src.shape[0],), jnp.float32)
    out = ps.pair_typed_gather_scatter(
        tables, zeros + 1.0, zeros_b + 1.0, ovf0, *plans.kernel_arrays, v
    )
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_host_inv_scales_match_device():
    """PairPlans.inv_* (host bincount+index) must equal the device-side
    pair_normalisation_scales over the same 1/(deg+eps) table."""
    from tf2_gnn_tpu.layers.message_passing.base import (
        calculate_type_to_num_incoming_edges,
    )
    from tf2_gnn_tpu.data.graph_batch import PaddingConfig, pad_batch_arrays
    from tf2_gnn_tpu.utils.constants import SMALL_NUMBER

    rng = np.random.RandomState(11)
    v, num_types = 512, 3
    # Real edges stay clear of the pad node (v-1): device-side degrees count
    # padded edge slots into the pad node's row, host-side ones don't.
    srcs, tgts, counts = [], [], []
    for _ in range(num_types):
        e = rng.randint(v // 2, v * 2)
        budget = ((e + 63) // 64) * 64
        s = np.full((budget,), v - 1, np.int32)
        t = np.full((budget,), v - 1, np.int32)
        s[:e] = rng.randint(0, v - 1, e)
        t[:e] = rng.randint(0, v - 1, e)
        srcs.append(s)
        tgts.append(t)
        counts.append(e)
    plans = ps.build_pair_plans(srcs, tgts, counts, v)

    # Device-side deg via the production path: build a real GraphBatch.
    adjacency = [
        np.stack([srcs[l][:counts[l]], tgts[l][:counts[l]]], axis=1)
        for l in range(num_types)
    ]
    config = PaddingConfig(
        num_nodes=v, num_graphs=2,
        edge_budgets=tuple(s.shape[0] for s in srcs),
    )
    batch = pad_batch_arrays(
        node_features=np.zeros((v - 1, 4), np.float32),
        adjacency_lists=adjacency,
        node_to_graph=np.zeros((v - 1,), np.int32),
        num_graphs=1,
        config=config,
    )
    deg = calculate_type_to_num_incoming_edges(batch).reshape(-1)
    inv = 1.0 / (deg + SMALL_NUMBER)
    sf, sb, so = ps.pair_normalisation_scales(plans.astuple(), inv, v)
    # Padded edges increment the pad node's degree on device but no real
    # slot references the pad node as target, so all slot scales agree.
    np.testing.assert_allclose(plans.inv_fwd, np.asarray(sf), rtol=1e-6)
    np.testing.assert_allclose(plans.inv_bwd, np.asarray(sb), rtol=1e-6)
    np.testing.assert_allclose(plans.inv_ovf, np.asarray(so), rtol=1e-6)


def test_merged_target_plans_give_per_type_aggregates():
    """merge_targets=True: kernel output [L*V, H] holds S_l[v] = sum of
    type-l messages into v (the building block for FiLM / target-state
    factorisations)."""
    rng = np.random.RandomState(5)
    v, num_types, h = 384, 3, 16
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans = ps.build_pair_plans(srcs, tgts, counts, v, merge_targets=True)
    tables = rng.randn(num_types * v, h).astype(np.float32)
    out_rows = num_types * v

    sf, sb, so = ps.pair_unit_scales(plans.astuple(), out_rows)
    out = ps.pair_typed_gather_scatter(
        jnp.asarray(tables), sf, sb, so, *plans.kernel_arrays, out_rows
    )
    expected = np.zeros((num_types, v, h), np.float64)
    for l in range(num_types):
        c = counts[l]
        np.add.at(expected[l], tgts[l][:c],
                  tables[l * v + srcs[l][:c]].astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(out).reshape(num_types, v, h), expected,
        rtol=2e-4, atol=2e-4,
    )

    # Normalisation scales index the merged degree table directly.
    from tf2_gnn_tpu.utils.constants import SMALL_NUMBER
    deg = np.zeros((num_types * v,), np.float32)
    for l in range(num_types):
        c = counts[l]
        np.add.at(deg, l * v + tgts[l][:c], 1.0)
    inv = 1.0 / (deg + SMALL_NUMBER)
    out_n = ps.pair_typed_gather_scatter(
        jnp.asarray(tables), jnp.asarray(plans.inv_fwd),
        jnp.asarray(plans.inv_bwd), jnp.asarray(plans.inv_ovf),
        *plans.kernel_arrays, out_rows
    )
    np.testing.assert_allclose(
        np.asarray(out_n), expected.reshape(out_rows, h) * inv[:, None],
        rtol=2e-4, atol=2e-4,
    )


def test_pair_chunk_budget_formula():
    b = ps.pair_chunk_budget(1000, 512)
    assert b % ps.GROUP == 0
    assert b * ps.E_C >= 2 * 1000  # default inflation 2x


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel runs on TPU only")
def test_pair_kernel_matches_fallback_on_tpu():
    """Device vs jnp fallback at the SHIPPED stream dtype (bf16): bf16
    products are exactly representable in f32, so both sides accumulate the
    same values and only the summation order differs — a tight bound. With
    f32 tables the device's default single-pass MXU truncates inputs to
    bf16 (the documented precision policy, matching XLA's own f32 matmul
    default) while the fallback computes full f32, so f32 device-vs-twin
    is NOT bit-comparable and carries ~1% relative spread; sanity-bounded
    loosely below."""
    rng = np.random.RandomState(0)
    v, num_types, h = 512, 3, 320
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans = ps.build_pair_plans(srcs, tgts, counts, v)
    tables_f32 = rng.randn(num_types * v, h).astype(np.float32)
    p = plans.fwd
    scale = jnp.ones((p.rel_src.size,), jnp.float32)

    tables = jnp.asarray(tables_f32).astype(jnp.bfloat16)
    dev = ps.pair_spmm(tables, scale, *p, v, interpret=False)
    ref = ps.pair_spmm(tables, scale, *p, v, interpret=True)
    np.testing.assert_allclose(np.asarray(dev), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    dev32 = ps.pair_spmm(jnp.asarray(tables_f32), scale, *p, v,
                         interpret=False)
    ref32 = ps.pair_spmm(jnp.asarray(tables_f32), scale, *p, v,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(dev32), np.asarray(ref32),
                               rtol=5e-2, atol=3e-1)


def _per_type_plans(srcs, tgts, counts, v, group_fwd=8, group_bwd=8):
    return tuple(
        ps.build_pair_plans([srcs[t]], [tgts[t]], [counts[t]], v,
                            group_fwd=group_fwd, group_bwd=group_bwd,
                            overflow_budget=64, overflow_size=64).astuple()
        for t in range(len(srcs))
    )


@pytest.mark.parametrize("normalize", [False, True])
def test_streamed_typed_plans_match_per_type_loop(normalize):
    """The single-launch streamed form (concat_typed_plans +
    pair_stream_gather_scatter) reproduces the per-type kernel loop it
    replaces — outputs AND gradients (QM9's 2L launches per layer)."""
    rng = np.random.RandomState(9)
    v, num_types, h = 384, 4, 16
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans_typed = _per_type_plans(srcs, tgts, counts, v)
    tables = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))
    cot = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))

    def loop_form(t):
        outs = []
        for ty, plans in enumerate(plans_typed):
            if normalize:
                sf, sb, so = (jnp.asarray(plans[10]), jnp.asarray(plans[11]),
                              jnp.asarray(plans[12]))
            else:
                sf, sb, so = ps.pair_unit_scales(plans, v)
            outs.append(ps.pair_typed_gather_scatter(
                t[ty * v:(ty + 1) * v], sf, sb, so, *plans[:10], v))
        return jnp.concatenate(outs, axis=0)

    def stream_form(t):
        return ps.pair_stream_from_typed(t, plans_typed, v, normalize)

    out_loop = loop_form(tables)
    out_stream = stream_form(tables)
    np.testing.assert_allclose(np.asarray(out_stream), np.asarray(out_loop),
                               rtol=2e-4, atol=2e-4)

    g_loop = jax.grad(lambda t: jnp.vdot(loop_form(t), cot))(tables)
    g_stream = jax.grad(lambda t: jnp.vdot(stream_form(t), cot))(tables)
    np.testing.assert_allclose(np.asarray(g_stream), np.asarray(g_loop),
                               rtol=2e-4, atol=2e-4)


def test_streamed_typed_plans_ext_src_space():
    """Streamed form with a LARGER per-type source row space than the local
    target rows (the SPMD-halo ext layout): matches a dense reference."""
    rng = np.random.RandomState(2)
    v, vs, num_types, h = 256, 384, 2, 8
    srcs, tgts, counts = [], [], []
    for _ in range(num_types):
        e = 700
        s = np.full((768,), vs - 1, np.int32)
        t = np.full((768,), v - 1, np.int32)
        s[:e] = rng.randint(0, vs, e)
        t[:e] = rng.randint(0, v, e)
        srcs.append(s)
        tgts.append(t)
        counts.append(e)
    plans_typed = tuple(
        ps.build_pair_plans([srcs[t]], [tgts[t]], [counts[t]], v,
                            src_space=vs, group_fwd=8, group_bwd=8,
                            overflow_budget=64, overflow_size=64).astuple()
        for t in range(num_types)
    )
    tables = rng.randn(num_types * vs, h).astype(np.float32)
    out = ps.pair_stream_from_typed(jnp.asarray(tables), plans_typed, v,
                                    normalize=False)
    expected = np.zeros((num_types * v, h), np.float64)
    for ty in range(num_types):
        c = counts[ty]
        np.add.at(expected, ty * v + tgts[ty][:c],
                  tables[ty * vs + srcs[ty][:c]].astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel runs on TPU only")
def test_streamed_kernel_matches_twin_on_tpu():
    """Device streamed kernel (type-sliced table re-DMA inside one launch)
    vs the jnp twin at bf16."""
    rng = np.random.RandomState(0)
    v, num_types, h = 512, 3, 256
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans_typed = _per_type_plans(srcs, tgts, counts, v)
    args = ps.concat_typed_plans(plans_typed, v, v, normalize=False)
    (sf, sb, so, rsf, rtf, sbf, gtf, gyf, rsb, rtb, sbb, gtb, gyb,
     osrc, otgt) = args
    tables = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32)
                         ).astype(jnp.bfloat16)
    dev = ps._pair_spmm_stream_device(tables, sf, rsf, rtf, sbf, gtf, gyf,
                                      v, num_types * v)
    ref = ps._pair_spmm_stream_jnp(tables, sf, rsf, rtf, sbf, gtf, gyf,
                                   v, num_types * v)
    np.testing.assert_allclose(np.asarray(dev), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # Backward direction (source-major plans, cotangent-resident form).
    cot = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32)
                      ).astype(jnp.bfloat16)
    dev_b = ps._pair_spmm_stream_device(cot, sb, rsb, rtb, sbb, gtb, gyb,
                                        v, num_types * v)
    ref_b = ps._pair_spmm_stream_jnp(cot, sb, rsb, rtb, sbb, gtb, gyb,
                                     v, num_types * v)
    np.testing.assert_allclose(np.asarray(dev_b), np.asarray(ref_b),
                               rtol=1e-4, atol=1e-4)


def test_concat_typed_plans_rejects_mismatched_groups():
    """Per-type plans built under different grid groups misindex slots if
    concatenated; the check must survive python -O (ValueError, not
    assert — advisor r4)."""
    rng = np.random.RandomState(11)
    v = 256
    srcs, tgts, counts = _random_edges(rng, 2, v)
    mixed = (
        _per_type_plans(srcs[:1], tgts[:1], counts[:1], v, group_fwd=8)[0],
        _per_type_plans(srcs[1:], tgts[1:], counts[1:], v, group_fwd=16)[0],
    )
    with pytest.raises(ValueError, match="shared .group_fwd, group_bwd."):
        ps.concat_typed_plans(mixed, v, v, normalize=False)


@pytest.mark.parametrize("normalize", [False, True])
def test_joint_stream_matches_per_type_sum(normalize):
    """The JOINT streamed op (whole-output window fwd + un-broadcast
    cotangent bwd) reproduces per-type-stream + reshape-sum — outputs AND
    gradients."""
    rng = np.random.RandomState(13)
    v, num_types, h = 384, 3, 24
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans_typed = _per_type_plans(srcs, tgts, counts, v)
    tables = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))
    cot = jnp.asarray(rng.randn(v, h).astype(np.float32))

    def ref_form(t):
        out = ps.pair_stream_from_typed(t, plans_typed, v, normalize)
        return out.reshape(num_types, v, -1).sum(axis=0)

    def joint_form(t):
        return ps.pair_stream_joint_from_typed(t, plans_typed, v, normalize)

    np.testing.assert_allclose(np.asarray(joint_form(tables)),
                               np.asarray(ref_form(tables)),
                               rtol=2e-4, atol=2e-4)
    g_ref = jax.grad(lambda t: jnp.vdot(ref_form(t), cot))(tables)
    g_joint = jax.grad(lambda t: jnp.vdot(joint_form(t), cot))(tables)
    np.testing.assert_allclose(np.asarray(g_joint), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel runs on TPU only")
def test_joint_stream_kernel_matches_twin_on_tpu():
    """Device joint kernel (whole-output VMEM window) vs the jnp twin."""
    rng = np.random.RandomState(3)
    v, num_types, h = 512, 3, 256
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans_typed = _per_type_plans(srcs, tgts, counts, v)
    args = ps.concat_typed_plans(plans_typed, v, v, normalize=False)
    (sf, sb, so, rsf, rtf, sbf, gtf, gyf, *_rest) = args
    gtf_l = jnp.asarray(gtf) - jnp.asarray(gyf) * (v // ps.BLK)
    tables = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32)
                         ).astype(jnp.bfloat16)
    dev = ps._pair_spmm_stream_joint_device(tables, sf, rsf, rtf, sbf,
                                            gtf_l, gyf, v, v)
    ref = ps._pair_spmm_stream_joint_jnp(tables, sf, rsf, rtf, sbf,
                                         gtf_l, gyf, v, v)
    np.testing.assert_allclose(np.asarray(dev), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_joint_stream_with_real_spills_matches():
    """Per-type plans with GENUINELY spilled pairs: the joint op's overflow
    branch (LOCAL overflow targets, un-broadcast bwd transpose) must stay
    exact for outputs AND gradients."""
    rng = np.random.RandomState(17)
    v, num_types, h = 384, 2, 8
    srcs, tgts, counts = _random_edges(rng, num_types, v, clusters=False)
    plans_typed = tuple(
        ps.build_pair_plans(
            [srcs[t]], [tgts[t]], [counts[t]], v,
            chunk_budget_fwd=ps.GROUP, chunk_budget_bwd=ps.GROUP,
            overflow_budget=((counts[t] + 63) // 64) * 64,
            group_fwd=8, group_bwd=8,
        ).astuple()
        for t in range(num_types)
    )
    spilled = sum(int(np.sum(np.asarray(p[9]) < v)) for p in plans_typed)
    assert spilled > 0  # the overflow branch is actually exercised

    tables = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))
    cot = jnp.asarray(rng.randn(v, h).astype(np.float32))

    def ref_form(t):
        out = ps.pair_stream_from_typed(t, plans_typed, v, False)
        return out.reshape(num_types, v, -1).sum(axis=0)

    def joint_form(t):
        return ps.pair_stream_joint_from_typed(t, plans_typed, v, False)

    np.testing.assert_allclose(np.asarray(joint_form(tables)),
                               np.asarray(ref_form(tables)),
                               rtol=2e-4, atol=2e-4)
    g_ref = jax.grad(lambda t: jnp.vdot(ref_form(t), cot))(tables)
    g_joint = jax.grad(lambda t: jnp.vdot(joint_form(t), cot))(tables)
    np.testing.assert_allclose(np.asarray(g_joint), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)
