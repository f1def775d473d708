"""Flash pair-attention equivalence + VJP tests (ops/pair_attention.py).

CPU tests exercise the plan semantics through the jnp twins (the Pallas
kernels are equivalence-tested against the twins on TPU — TPU-gated test at
the bottom, plus benchmarks/pair_attention_probe.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.ops import pair_attention as pa
from tf2_gnn_tpu.ops import pair_spmm as ps


def _random_edges(rng, num_types, v, avg_deg=4, clusters=True):
    srcs, tgts, counts = [], [], []
    for _ in range(num_types):
        e = rng.randint(v // 2, v * avg_deg)
        if clusters:
            centers = rng.randint(0, v, max(e // 40, 1))
            base = centers[rng.randint(0, len(centers), e)]
            src = np.clip(base + rng.randint(-48, 48, e), 0, v - 1)
            tgt = np.clip(base + rng.randint(-48, 48, e), 0, v - 1)
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


def _edge_arrays(srcs, tgts, counts, v):
    """(merged src rows, tgt nodes) over the real edges of every type."""
    rows, nodes = [], []
    for l, (s, t, c) in enumerate(zip(srcs, tgts, counts)):
        rows.append(s[:c].astype(np.int64) + l * v)
        nodes.append(t[:c].astype(np.int64))
    return np.concatenate(rows), np.concatenate(nodes)


def _dense_reference(table, scores, src_rows, tgt_nodes, v, k):
    """Float64 edge-wise reference of (denom, weighted) with the same
    stop-gradient stabiliser semantics (max per (target, head) jointly)."""
    table = np.asarray(table, np.float64)
    scores = np.asarray(scores, np.float64)
    ltype = src_rows // v
    p = scores[src_rows, :k] + scores[ltype * v + tgt_nodes, k:]
    logit = np.where(p >= 0, p, pa.LEAKY_SLOPE * p)
    m = np.full((v, k), pa.NEG, np.float64)
    np.maximum.at(m, tgt_nodes, logit)
    m_safe = np.where(m > 0.5 * pa.NEG, m, 0.0)
    expd = np.exp(logit - m_safe[tgt_nodes])
    denom = np.zeros((v, k), np.float64)
    np.add.at(denom, tgt_nodes, expd)
    h = table.shape[1]
    head_dim = h // k
    weighted = np.zeros((v, h), np.float64)
    np.add.at(weighted, tgt_nodes,
              table[src_rows] * np.tile(expd, (1, head_dim)))
    return denom, weighted


def _build(rng, v=256, num_types=3, k=4, head_dim=8, **plan_kwargs):
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans = ps.build_pair_plans(srcs, tgts, counts, v, **plan_kwargs)
    rows = num_types * v
    table = rng.randn(rows, head_dim * k).astype(np.float32)
    scores = (0.5 * rng.randn(rows, 2 * k)).astype(np.float32)
    src_rows, tgt_nodes = _edge_arrays(srcs, tgts, counts, v)
    return plans, table, scores, src_rows, tgt_nodes


@pytest.mark.parametrize("seed", [0, 1])
def test_pair_attention_matches_dense_reference(seed):
    rng = np.random.RandomState(seed)
    v, num_types, k, head_dim = 256, 3, 4, 8
    plans, table, scores, src_rows, tgt_nodes = _build(
        rng, v, num_types, k, head_dim)
    denom, weighted = pa.pair_attention(
        jnp.asarray(table), jnp.asarray(scores), *plans.kernel_arrays, v, k)
    denom_ref, weighted_ref = _dense_reference(
        table, scores, src_rows, tgt_nodes, v, k)
    np.testing.assert_allclose(np.asarray(denom), denom_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weighted), weighted_ref,
                               rtol=1e-4, atol=1e-4)


def test_bound_stabiliser_dominates_true_max():
    """m̂ >= the true per-(target, head) max logit on every target with
    in-edges — the property that makes the normalised output exact and
    keeps expd <= 1 (no overflow)."""
    rng = np.random.RandomState(7)
    v, num_types, k = 256, 3, 4
    plans, table, scores, src_rows, tgt_nodes = _build(rng, v, num_types, k, 8)
    m_hat = np.asarray(pa._bound_stabiliser(jnp.asarray(scores), v, k))
    ltype = src_rows // v
    p = (scores[src_rows, :k].astype(np.float64)
         + scores[ltype * v + tgt_nodes, k:].astype(np.float64))
    logit = np.where(p >= 0, p, pa.LEAKY_SLOPE * p)
    m_true = np.full((v, k), pa.NEG, np.float64)
    np.maximum.at(m_true, tgt_nodes, logit)
    has_edges = m_true > 0.5 * pa.NEG
    assert np.all(m_hat[has_edges] >= m_true[has_edges] - 1e-5)


@pytest.mark.parametrize("form", ["merged", "typed"])
def test_bound_stabiliser_matches_exact_normalised(form):
    """The 'bound' stabiliser must reproduce the 'exact' path's NORMALISED
    attention output and its gradients (softmax shift invariance); only the
    unnormalised (denom, weighted) pair scales by exp(max - m̂)."""
    rng = np.random.RandomState(5)
    v, num_types, k, head_dim = 256, 3, 4, 8
    if form == "merged":
        plans, table, scores, _, _ = _build(rng, v, num_types, k, head_dim)

        def run(table_, scores_, stab):
            return pa.pair_attention(
                table_, scores_, *plans.kernel_arrays, v, k, stab)
    else:
        srcs, tgts, counts = _random_edges(rng, num_types, v)
        plans_typed = tuple(
            ps.build_pair_plans([s], [t], [c], v).astuple()
            for s, t, c in zip(srcs, tgts, counts)
        )
        table = rng.randn(num_types * v, head_dim * k).astype(np.float32)
        scores = (0.5 * rng.randn(num_types * v, 2 * k)).astype(np.float32)

        def run(table_, scores_, stab):
            return pa.pair_attention_typed(table_, scores_, plans_typed,
                                           v, k, stab)

    def normalised(table_, scores_, stab):
        # Where-guarded division, as the RGAT layer consumes it: an
        # additive eps would distort loose-bound targets (the bound path's
        # denominators sit exp(max - m̂) below the exact path's >= 1).
        denom, weighted = run(table_, scores_, stab)
        d = jnp.tile(denom, (1, head_dim))
        return jnp.where(d > 0, weighted / jnp.where(d > 0, d, 1.0), 0.0)

    t = jnp.asarray(table)
    s = jnp.asarray(scores)
    out_exact = normalised(t, s, "exact")
    out_bound = normalised(t, s, "bound")
    np.testing.assert_allclose(np.asarray(out_bound), np.asarray(out_exact),
                               rtol=1e-4, atol=1e-5)

    cot = jnp.asarray(rng.randn(*out_exact.shape).astype(np.float32))

    def loss(table_, scores_, stab):
        return jnp.vdot(normalised(table_, scores_, stab), cot)

    g_exact = jax.grad(loss, argnums=(0, 1))(t, s, "exact")
    g_bound = jax.grad(loss, argnums=(0, 1))(t, s, "bound")
    for ge, gb, name in zip(g_exact, g_bound, ("d_table", "d_scores")):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ge),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("stab", ["exact", "bound"])
def test_pair_attention_ext_src_space_matches_dense(stab):
    """SPMD-halo form: sources live in the EXT row space [local | halo]
    (src_space > num_nodes), targets stay local. The composed primitive and
    its gradients must match the dense reference over the same edges."""
    rng = np.random.RandomState(17)
    v, vs, num_types, k, head_dim = 256, 384, 3, 4, 8
    srcs, tgts, counts = [], [], []
    for _ in range(num_types):
        e = 700
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
    table = rng.randn(rows, head_dim * k).astype(np.float32)
    scores = (0.5 * rng.randn(rows, 2 * k)).astype(np.float32)
    rowl = [s[:c].astype(np.int64) + l * vs
            for l, (s, c) in enumerate(zip(srcs, counts))]
    nodel = [t[:c].astype(np.int64) for t, c in zip(tgts, counts)]
    src_rows = np.concatenate(rowl)
    tgt_nodes = np.concatenate(nodel)

    # f64 dense reference in the ext row space.
    t64 = table.astype(np.float64)
    s64 = scores.astype(np.float64)
    ltype = src_rows // vs
    p = s64[src_rows, :k] + s64[ltype * vs + tgt_nodes, k:]
    logit = np.where(p >= 0, p, pa.LEAKY_SLOPE * p)
    m = np.full((v, k), pa.NEG)
    np.maximum.at(m, tgt_nodes, logit)
    m_safe = np.where(m > 0.5 * pa.NEG, m, 0.0)
    expd = np.exp(logit - m_safe[tgt_nodes])
    denom_ref = np.zeros((v, k))
    np.add.at(denom_ref, tgt_nodes, expd)
    weighted_ref = np.zeros((v, head_dim * k))
    np.add.at(weighted_ref, tgt_nodes,
              t64[src_rows] * np.tile(expd, (1, head_dim)))

    def normalised(t_, s_):
        denom, weighted = pa.pair_attention(
            t_, s_, *plans.kernel_arrays, v, k, stab, vs)
        d = jnp.tile(denom, (1, head_dim))
        return jnp.where(d > 0, weighted / jnp.where(d > 0, d, 1.0), 0.0)

    out = normalised(jnp.asarray(table), jnp.asarray(scores))
    dr = np.tile(denom_ref, (1, head_dim))
    norm_ref = np.where(dr > 0, weighted_ref / np.where(dr > 0, dr, 1.0), 0.0)
    np.testing.assert_allclose(np.asarray(out), norm_ref,
                               rtol=1e-4, atol=1e-4)

    cot = jnp.asarray(rng.randn(v, head_dim * k).astype(np.float32))
    g_t, g_s = jax.grad(
        lambda t_, s_: jnp.vdot(normalised(t_, s_), cot), argnums=(0, 1)
    )(jnp.asarray(table), jnp.asarray(scores))
    # Finite-difference spot check on a handful of table entries.
    eps = 1e-3
    for idx in [(5, 3), (int(src_rows[0]), 0), (rows - 1, head_dim * k - 1)]:
        tp = table.copy()
        tp[idx] += eps
        tm = table.copy()
        tm[idx] -= eps
        fd = (float(jnp.vdot(normalised(jnp.asarray(tp),
                                        jnp.asarray(scores)), cot))
              - float(jnp.vdot(normalised(jnp.asarray(tm),
                                          jnp.asarray(scores)), cot))) / (
            2 * eps)
        np.testing.assert_allclose(float(g_t[idx]), fd, rtol=2e-2, atol=2e-3)


def test_pair_attention_bf16_error_bound():
    """Full fused forward on bf16 streams vs the float64 dense reference:
    pins the bf16-table error bound of the SHIPPED configuration. The
    head-major path's denominators inherit stream-dtype rounding (~0.4%
    relative per expd term, partially cancelling between numerator and
    denominator of the normalised weights); softmax statistics themselves
    are computed in f32 off exact bf16 inputs."""
    rng = np.random.RandomState(11)
    v, num_types, k, head_dim = 256, 3, 4, 8
    plans, table, scores, src_rows, tgt_nodes = _build(
        rng, v, num_types, k, head_dim)
    table_bf = jnp.asarray(table).astype(jnp.bfloat16)
    scores_bf = jnp.asarray(scores).astype(jnp.bfloat16)
    denom, weighted = pa.pair_attention(
        table_bf, scores_bf, *plans.kernel_arrays, v, k)
    denom_ref, weighted_ref = _dense_reference(
        np.asarray(table_bf, np.float64), np.asarray(scores_bf, np.float64),
        src_rows, tgt_nodes, v, k)
    # bf16 has ~2-3 significant decimal digits; the segment sums accumulate
    # in f32, so the bound is a small multiple of one bf16 ulp.
    np.testing.assert_allclose(np.asarray(denom, np.float64), denom_ref,
                               rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(weighted, np.float64), weighted_ref,
                               rtol=2e-2, atol=5e-2)
    # The NORMALISED attention output (what the layer consumes) cancels the
    # shared rounding of numerator and denominator — tighter bound.
    norm = np.asarray(weighted, np.float64) / (
        np.tile(np.asarray(denom, np.float64), (1, head_dim)) + 1e-7)
    norm_ref = weighted_ref / (np.tile(denom_ref, (1, head_dim)) + 1e-7)
    np.testing.assert_allclose(norm, norm_ref, rtol=2e-2, atol=2e-2)


def test_pair_attention_overflow_spill_exact():
    """Spilled edges must join the same softmax (max AND denominator)."""
    rng = np.random.RandomState(3)
    v, num_types, k, head_dim = 512, 2, 4, 4
    srcs, tgts, counts = _random_edges(rng, num_types, v, clusters=False)
    total = sum(counts)
    plans = ps.build_pair_plans(
        srcs, tgts, counts, v,
        chunk_budget_fwd=ps.GROUP, chunk_budget_bwd=ps.GROUP,
        overflow_budget=((total + 63) // 64) * 64,
    )
    assert int(np.sum(np.asarray(plans.ovf_tgt) < v)) > 0
    rows = num_types * v
    table = rng.randn(rows, head_dim * k).astype(np.float32)
    scores = (0.5 * rng.randn(rows, 2 * k)).astype(np.float32)
    src_rows, tgt_nodes = _edge_arrays(srcs, tgts, counts, v)
    denom, weighted = pa.pair_attention(
        jnp.asarray(table), jnp.asarray(scores), *plans.kernel_arrays, v, k)
    denom_ref, weighted_ref = _dense_reference(
        table, scores, src_rows, tgt_nodes, v, k)
    np.testing.assert_allclose(np.asarray(denom), denom_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weighted), weighted_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("spill", [False, True])
def test_pair_attention_gradients_match_xla(spill):
    rng = np.random.RandomState(7)
    v, num_types, k, head_dim = 256, 2, 4, 4
    srcs, tgts, counts = _random_edges(rng, num_types, v, clusters=not spill)
    plan_kwargs = {}
    if spill:
        total = sum(counts)
        plan_kwargs = dict(
            chunk_budget_fwd=ps.GROUP, chunk_budget_bwd=ps.GROUP,
            overflow_budget=((total + 63) // 64) * 64,
        )
    plans = ps.build_pair_plans(srcs, tgts, counts, v, **plan_kwargs)
    rows = num_types * v
    table = jnp.asarray(rng.randn(rows, head_dim * k).astype(np.float32))
    scores = jnp.asarray((0.5 * rng.randn(rows, 2 * k)).astype(np.float32))
    src_rows, tgt_nodes = _edge_arrays(srcs, tgts, counts, v)
    cot_d = jnp.asarray(rng.randn(v, k).astype(np.float32))
    cot_w = jnp.asarray(rng.randn(v, head_dim * k).astype(np.float32))

    def via_pairs(t, s):
        denom, weighted = pa.pair_attention(
            t, s, *plans.kernel_arrays, v, k)
        return jnp.vdot(denom, cot_d) + jnp.vdot(weighted, cot_w)

    def via_xla(t, s):
        ltype = src_rows // v
        p = (jnp.take(s, src_rows, axis=0)[:, :k]
             + jnp.take(s, ltype * v + tgt_nodes, axis=0)[:, k:])
        logit = jnp.where(p >= 0, p, pa.LEAKY_SLOPE * p)
        m = jax.ops.segment_max(logit, tgt_nodes, num_segments=v)
        m = jax.lax.stop_gradient(jnp.where(m > 0.5 * pa.NEG, m, 0.0))
        expd = jnp.exp(logit - m[tgt_nodes])
        denom = jax.ops.segment_sum(expd, tgt_nodes, num_segments=v)
        weighted = jax.ops.segment_sum(
            jnp.take(t, src_rows, axis=0) * jnp.tile(expd, (1, head_dim)),
            tgt_nodes, num_segments=v)
        return jnp.vdot(denom, cot_d) + jnp.vdot(weighted, cot_w)

    g_pair = jax.grad(via_pairs, argnums=(0, 1))(table, scores)
    g_xla = jax.grad(via_xla, argnums=(0, 1))(table, scores)
    for a, b in zip(g_pair, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_padding_chunks_inherit_previous_src_block():
    """d-score run-accumulation invariant: a padding chunk must carry the
    PREVIOUS real chunk's src block so its composed out-block index revisits
    (instead of overwriting) an already-accumulated block."""
    rng = np.random.RandomState(5)
    v = 512
    srcs, tgts, counts = _random_edges(rng, 2, v)
    plans = ps.build_pair_plans(srcs, tgts, counts, v)
    for plan in (plans.fwd, plans.bwd):
        padding = (plan.rel_src >= ps.BLK).all(axis=1)
        prev = np.roll(plan.src_blk, 1)
        prev[0] = plan.src_blk[0]
        np.testing.assert_array_equal(plan.src_blk[padding], prev[padding])


def test_rgat_pair_path_matches_plain(tmp_path):
    """RGAT with non-merged pair plans (3 heads -> padded to 4) must match
    the plain per-edge path, outputs and parameter gradients."""
    from tests.synthetic_data import write_jsonl_property_dataset
    from tf2_gnn_tpu import DataFold
    from tf2_gnn_tpu.data import JsonLGraphPropertyDataset
    from tf2_gnn_tpu.layers import GNN

    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({
        "num_fwd_edge_types": 1,
        "max_nodes_per_batch": 40,
        "use_pair_spmm": True,
    })
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(tmp_path, {DataFold.VALIDATION})
    batch_pair, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert batch_pair.pair_plans is not None
    assert not batch_pair.pair_targets_merged
    batch_plain = batch_pair.replace(pair_plans=None)

    hp = GNN.get_default_hyperparameters("rgat")
    hp.update({"hidden_dim": 12, "num_layers": 2, "num_heads": 3})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_pair, _ = gnn.apply(variables, batch_pair, False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pair),
                               rtol=1e-4, atol=1e-4)

    def loss(vs, b):
        out, _ = gnn.apply(vs, b, False)
        return (out * out).sum()

    g_plain = jax.grad(loss)(variables, batch_plain)
    g_pair = jax.grad(loss)(variables, batch_pair)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_rgat_pair_applicability_gate():
    from tf2_gnn_tpu.layers.message_passing.rgat import RGAT

    layer = RGAT(hidden_dim=32, num_heads=4)
    assert layer._padded_heads() == 4
    layer3 = RGAT(hidden_dim=30, num_heads=3)
    assert layer3._padded_heads() == 4
    assert pa.pair_attention_applicable(
        512, 256, 32, 4, jnp.float32, jnp.float32)
    # Non-BLK-aligned node count -> decline.
    assert not pa.pair_attention_applicable(
        512, 250, 32, 4, jnp.float32, jnp.float32)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernels run on TPU only")
def test_pair_attention_kernels_match_twins_on_tpu():
    rng = np.random.RandomState(0)
    v, num_types, k, head_dim = 512, 3, 8, 40
    plans, table, scores, src_rows, tgt_nodes = _build(
        rng, v, num_types, k, head_dim)
    table = jnp.asarray(table)
    scores = jnp.asarray(scores)
    args = plans.kernel_arrays

    del args
    rows = num_types * v
    f, b = plans.fwd, plans.bwd
    m_ref = pa.pair_attention_max(scores, *f, v, k, interpret=True)
    m_dev = pa.pair_attention_max(scores, *f, v, k, interpret=False)
    np.testing.assert_allclose(np.asarray(m_dev), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    m_safe = jnp.where(m_ref > 0.5 * pa.NEG, m_ref, 0.0)
    e_ref, s_ref = pa.pair_attention_expd(
        scores, m_safe, *f, v, k, interpret=True)
    e_dev, s_dev = pa.pair_attention_expd(
        scores, m_safe, *f, v, k, interpret=False)
    np.testing.assert_allclose(np.asarray(e_dev), np.asarray(e_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_dev), np.asarray(s_ref),
                               rtol=1e-6, atol=1e-6)
    # The agg kernel consumes the legacy [slots, W] stream layout; the
    # expd stream is transposed [W, slots].
    r = pa.pair_attention_agg(table, e_ref.T, *f, v, k, interpret=True)
    d = pa.pair_attention_agg(table, e_ref.T, *f, v, k, interpret=False)
    for x, y in zip(jax.tree.leaves(d), jax.tree.leaves(r)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-3)
    dw = jnp.asarray(np.random.RandomState(2).randn(
        v, table.shape[1]).astype(np.float32))
    dd = jnp.asarray(np.random.RandomState(3).randn(v, k).astype(np.float32))
    r3 = pa.pair_attention_bwd_fused(table, dw, dd, scores, m_safe, *b, v, k,
                                     interpret=True)
    d3 = pa.pair_attention_bwd_fused(table, dw, dd, scores, m_safe, *b, v, k,
                                     interpret=False)
    for name, x, y in zip(("d_ss", "d_ts", "d_table"), d3, r3):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-3, err_msg=name)
    # The COMPOSED production forward (head_dim=40 here routes through
    # _headmajor_sums + pair_spmm on device) vs the dense reference — the
    # shipped path, not just its per-kernel pieces. The layer's contract is
    # the NORMALISED attention output, so that is what gets the tight
    # bound; the raw weighted sums carry the MXU's default single-pass
    # rounding amplified wherever terms nearly cancel, and are only
    # sanity-bounded.
    denom_d, weighted_d = jax.jit(
        lambda t, s: pa.pair_attention(t, s, *plans.kernel_arrays, v, k)
    )(table, scores)
    denom_ref, weighted_ref = _dense_reference(
        np.asarray(table), np.asarray(scores), src_rows, tgt_nodes, v, k)
    np.testing.assert_allclose(np.asarray(denom_d), denom_ref,
                               rtol=5e-3, atol=5e-3)
    head_dim = table.shape[1] // k
    dd = np.tile(np.asarray(denom_d), (1, head_dim))
    norm_d = np.where(dd > 0, np.asarray(weighted_d)
                      / np.where(dd > 0, dd, 1.0), 0.0)
    dr = np.tile(denom_ref, (1, head_dim))
    norm_ref = np.where(dr > 0, weighted_ref / np.where(dr > 0, dr, 1.0),
                        0.0)
    np.testing.assert_allclose(norm_d, norm_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(weighted_d), weighted_ref,
                               rtol=2e-1, atol=2e-1)


def test_pair_attention_applicable_rejects_many_heads():
    """Head counts above 8 cannot ride the kernels' head-column tiling
    (K=16 additionally blows Mosaic's scoped-VMEM stack at production
    scale) and must fall back to the sorted-scatter path."""
    assert pa.pair_attention_applicable(
        1536, 512, 320, 8, jnp.bfloat16, jnp.bfloat16)
    assert not pa.pair_attention_applicable(
        1536, 512, 320, 16, jnp.bfloat16, jnp.bfloat16)
    assert not pa.pair_attention_applicable(
        1536, 512, 320, 32, jnp.bfloat16, jnp.bfloat16)


def test_pair_attention_typed_matches_dense_reference():
    """The per-type (row-split) primitive reproduces the joint softmax of
    the merged form: per-type launches share one joint stabiliser."""
    rng = np.random.RandomState(9)
    v, num_types, k, head_dim = 256, 3, 4, 8
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    rows = num_types * v
    table = rng.randn(rows, head_dim * k).astype(np.float32)
    scores = (0.5 * rng.randn(rows, 2 * k)).astype(np.float32)
    src_rows, tgt_nodes = _edge_arrays(srcs, tgts, counts, v)
    plans_typed = tuple(
        ps.build_pair_plans([srcs[l]], [tgts[l]], [counts[l]], v).astuple()
        for l in range(num_types)
    )
    denom, weighted = pa.pair_attention_typed(
        jnp.asarray(table), jnp.asarray(scores), plans_typed, v, k)
    denom_ref, weighted_ref = _dense_reference(
        table, scores, src_rows, tgt_nodes, v, k)
    np.testing.assert_allclose(np.asarray(denom), denom_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weighted), weighted_ref,
                               rtol=1e-4, atol=1e-4)
    # Gradients match the merged-form primitive on the same inputs.
    merged = ps.build_pair_plans(srcs, tgts, counts, v)
    cot_d = jnp.asarray(rng.randn(v, k).astype(np.float32))
    cot_w = jnp.asarray(rng.randn(v, head_dim * k).astype(np.float32))

    def via_typed(t, s):
        d, w = pa.pair_attention_typed(t, s, plans_typed, v, k)
        return jnp.vdot(d, cot_d) + jnp.vdot(w, cot_w)

    def via_merged(t, s):
        d, w = pa.pair_attention(t, s, *merged.kernel_arrays, v, k)
        return jnp.vdot(d, cot_d) + jnp.vdot(w, cot_w)

    g_t = jax.grad(via_typed, argnums=(0, 1))(jnp.asarray(table),
                                              jnp.asarray(scores))
    g_m = jax.grad(via_merged, argnums=(0, 1))(jnp.asarray(table),
                                               jnp.asarray(scores))
    for a, b in zip(g_t, g_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
