"""Dedicated pair kernel for the target-state 1-hidden edge MLP
(ops/pair_edge_mlp.py) — the reference's DEFAULT GNN_Edge_MLP configuration
(tf2_gnn/layers/message_passing/gnn_edge_mlp.py:48-52).

CPU tests exercise the jnp twins + layer routing/equivalence; the Pallas
kernels are equivalence-tested against the twins in the TPU-gated test at
the bottom (all three passes: forward, dB, dA).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.ops import pair_spmm as ps
from tf2_gnn_tpu.ops import pair_edge_mlp as pem

try:
    from .test_pair_spmm import _random_edges
except ImportError:  # benchmarks/device_equiv.py imports tests top-level
    from test_pair_spmm import _random_edges


def _merged_plans(rng, num_types, v):
    srcs, tgts, counts = _random_edges(rng, num_types, v)
    plans = ps.build_pair_plans(srcs, tgts, counts, v, merge_targets=True)
    return srcs, tgts, counts, plans


def _dense_reference(a, b, srcs, tgts, counts, v, inv=None):
    """R[l*V+t] = sum over real type-l edges (u -> t) of
    scale * relu(a[l*V+u] + b[l*V+t]); float64 numpy."""
    num_types = len(srcs)
    h = a.shape[1]
    out = np.zeros((num_types * v, h), np.float64)
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    for l in range(num_types):
        c = counts[l]
        rows = l * v + tgts[l][:c]
        r = np.maximum(a64[l * v + srcs[l][:c]] + b64[rows], 0.0)
        if inv is not None:
            r = r * inv[rows][:, None]
        np.add.at(out, rows, r)
    return out


def _call_op(a, b, plans, out_rows, scales=None):
    t = plans.astuple()
    if scales is None:
        scales = ps.pair_unit_scales(t, out_rows)
    return pem.pair_relu_mlp_aggregate(
        jnp.asarray(a), jnp.asarray(b), *scales, *t[:10], out_rows
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_pair_relu_mlp_aggregate_matches_reference(seed):
    rng = np.random.RandomState(seed)
    v, num_types, h = 384, 3, 16
    srcs, tgts, counts, plans = _merged_plans(rng, num_types, v)
    a = rng.randn(num_types * v, h).astype(np.float32)
    b = rng.randn(num_types * v, h).astype(np.float32)
    out = _call_op(a, b, plans, num_types * v)
    ref = _dense_reference(a, b, srcs, tgts, counts, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pair_relu_mlp_aggregate_normalised_scales():
    """The host-precomputed inv_* scales reproduce the per-type 1/deg
    normalisation of the reference's normalize_by_num_incoming."""
    from tf2_gnn_tpu.utils.constants import SMALL_NUMBER

    rng = np.random.RandomState(1)
    v, num_types, h = 384, 2, 16
    srcs, tgts, counts, plans = _merged_plans(rng, num_types, v)
    a = rng.randn(num_types * v, h).astype(np.float32)
    b = rng.randn(num_types * v, h).astype(np.float32)
    deg = np.zeros((num_types * v,), np.float32)
    for l in range(num_types):
        np.add.at(deg, l * v + tgts[l][: counts[l]], 1.0)
    inv = 1.0 / (deg + SMALL_NUMBER)
    scales = (jnp.asarray(plans.inv_fwd), jnp.asarray(plans.inv_bwd),
              jnp.asarray(plans.inv_ovf))
    out = _call_op(a, b, plans, num_types * v, scales)
    ref = _dense_reference(a, b, srcs, tgts, counts, v, inv=inv)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_gradients_match_xla():
    """d/da and d/db of the custom VJP (mask recomputed in-register in the
    real kernels; the twins mirror the semantics) vs plain XLA autodiff of
    the same edge-space expression."""
    rng = np.random.RandomState(7)
    v, num_types, h = 384, 2, 16
    srcs, tgts, counts, plans = _merged_plans(rng, num_types, v)
    a = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))
    b = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))
    cot = jnp.asarray(rng.randn(num_types * v, h).astype(np.float32))
    out_rows = num_types * v

    def via_kernel(ab):
        return jnp.vdot(_call_op(ab[0], ab[1], plans, out_rows), cot)

    def via_xla(ab):
        acc = jnp.zeros((out_rows, h))
        for l in range(num_types):
            c = counts[l]
            rows = l * v + tgts[l][:c]
            r = jax.nn.relu(
                jnp.take(ab[0], l * v + srcs[l][:c], axis=0)
                + jnp.take(ab[1], rows, axis=0)
            )
            acc = acc + jax.ops.segment_sum(r, rows, num_segments=out_rows)
        return jnp.vdot(acc, cot)

    g_k = jax.grad(via_kernel)((a, b))
    g_x = jax.grad(via_xla)((a, b))
    for gk, gx in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Layer-level: the default GNN_Edge_MLP config routes here and matches the
# per-edge XLA path.


def _merged_batch(tmp_path):
    from .test_fused_path import _merged_pair_dataset
    from tf2_gnn_tpu.data import DataFold

    ds = _merged_pair_dataset(tmp_path)
    batch, _ = next(ds.batch_iterator(DataFold.VALIDATION))
    assert batch.pair_targets_merged
    return batch


@pytest.mark.parametrize("normalize", [False, True])
def test_layer_default_config_matches_standard(tmp_path, normalize):
    from tf2_gnn_tpu.layers.gnn import GNN

    batch_pair = _merged_batch(tmp_path)
    batch_plain = batch_pair.replace(pair_plans=None, scatter_plans=None)

    hp = GNN.get_default_hyperparameters("gnn_edge_mlp")
    assert hp["use_target_state_as_input"] and \
        hp["num_edge_MLP_hidden_layers"] == 1  # the reference default
    hp.update({"hidden_dim": 8, "num_layers": 2,
               "normalize_by_num_incoming": normalize})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch_plain, False)
    out_plain, _ = gnn.apply(variables, batch_plain, False)
    out_pair, _ = gnn.apply(variables, batch_pair, False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pair),
                               rtol=1e-4, atol=1e-5)

    def loss(v, b):
        out, _ = gnn.apply(v, b, False)
        return (out * out).sum()

    g_plain = jax.grad(loss)(variables, batch_plain)
    g_pair = jax.grad(loss)(variables, batch_pair)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_layer_routes_to_pair_edge_mlp(tmp_path):
    """The default config on a merged-target batch actually invokes the
    dedicated kernel (no silent fallback to the scatter-plan form)."""
    from unittest import mock

    from tf2_gnn_tpu.layers.gnn import GNN

    batch = _merged_batch(tmp_path)
    hp = GNN.get_default_hyperparameters("gnn_edge_mlp")
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)
    with mock.patch.object(
        pem, "pair_relu_mlp_aggregate",
        side_effect=pem.pair_relu_mlp_aggregate,
    ) as m:
        variables = gnn.init(jax.random.PRNGKey(0), batch, False)
        gnn.apply(variables, batch, False)
    assert m.call_count == 4  # 2 layers x (init + apply)


def test_residency_gate_falls_back(tmp_path):
    """Above the dual-residency VMEM budget the layer must return the
    scatter-plan fallback, not crash: force the gate shut and check the
    output is unchanged (both forms compute the same function)."""
    from unittest import mock

    from tf2_gnn_tpu.layers.gnn import GNN

    batch = _merged_batch(tmp_path)
    hp = GNN.get_default_hyperparameters("gnn_edge_mlp")
    hp.update({"hidden_dim": 8, "num_layers": 2})
    gnn = GNN.from_params(hp)
    variables = gnn.init(jax.random.PRNGKey(0), batch, False)
    out_fast, _ = gnn.apply(variables, batch, False)
    with mock.patch.object(pem, "pair_edge_mlp_applicable",
                           return_value=False):
        out_slow, _ = gnn.apply(variables, batch, False)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_slow),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# TPU-gated device-vs-twin equivalence for all three Pallas passes.


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernels run on TPU only")
def test_pair_edge_mlp_kernels_match_twins_on_tpu():
    """bf16 streams. The FORWARD's per-edge message relu(a[u]+b[t])*s is a
    genuine f32 sum rounded to bf16 for the scatter dot (the framework's
    stream-dtype policy — the scatter-plan form rounds identically via
    ``r.astype(edge_dtype)``), while the jnp twin keeps f32: tolerance is
    the bf16 truncation level (~0.4% measured max). The dB/dA passes with
    unit scales move only exactly-representable values (one-hot gathers of
    bf16 rows; masks of exact 1.0), so they compare tightly."""
    rng = np.random.RandomState(0)
    v, num_types, h = 512, 3, 320
    srcs, tgts, counts, plans = _merged_plans(rng, num_types, v)
    out_rows = num_types * v
    a = jnp.asarray(rng.randn(out_rows, h).astype(np.float32)
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(out_rows, h).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g = jnp.asarray(rng.randn(out_rows, h).astype(np.float32)
                    ).astype(jnp.bfloat16)
    t = plans.astuple()
    sf, sb, _ = ps.pair_unit_scales(t, out_rows)
    fwd_args = (sf, *t[0:4], out_rows)
    dev = pem._relu_pair_fwd_device(a, b, *fwd_args)
    ref = pem._relu_pair_fwd_jnp(a, b, *fwd_args)
    np.testing.assert_allclose(np.asarray(dev), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)

    # Fused training forward: R matches the plain forward's tolerance, the
    # mask aggregate M is exact with unit scales.
    dev_r, dev_m = pem._relu_pair_fwd_m_device(a, b, *fwd_args)
    ref_r, ref_m = pem._relu_pair_fwd_m_jnp(a, b, *fwd_args)
    np.testing.assert_allclose(np.asarray(dev_r), np.asarray(ref_r),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(dev_m), np.asarray(ref_m),
                               rtol=1e-4, atol=1e-4)

    dev_db = pem._relu_pair_db_device(a, b, g, *fwd_args)
    ref_db = pem._relu_pair_db_jnp(a, b, g, *fwd_args)
    np.testing.assert_allclose(np.asarray(dev_db), np.asarray(ref_db),
                               rtol=1e-4, atol=1e-4)

    bwd_args = (sb, *t[4:8], out_rows)
    dev_da = pem._relu_pair_da_device(a, b, g, *bwd_args)
    ref_da = pem._relu_pair_da_jnp(a, b, g, *bwd_args)
    np.testing.assert_allclose(np.asarray(dev_da), np.asarray(ref_da),
                               rtol=1e-4, atol=1e-4)
