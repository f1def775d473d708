"""Pallas sorted-scatter kernel vs XLA segment_sum (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_gnn_tpu.ops.spmm_pallas import (
    build_dual_plans,
    BLOCK_NODES,
    CHUNK_EDGES,
    apply_plan_to_sources,
    gather_scatter_sorted,
    plan_chunk_budget,
    plan_sorted_scatter,
    sorted_segment_sum,
)


def _random_edges(num_edges, v, seed=0):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, v, num_edges).astype(np.int32)
    tgt = rng.randint(0, v, num_edges).astype(np.int32)
    return src, tgt


@pytest.mark.parametrize("num_edges,v,h", [
    (1000, 256, 128),
    (3000, 384, 320),
    (CHUNK_EDGES, BLOCK_NODES, 128),     # exactly one chunk/block
    (7, 128, 128),                       # tiny edge count
])
def test_sorted_segment_sum_matches_xla(num_edges, v, h):
    src, tgt = _random_edges(num_edges, v)
    rng = np.random.RandomState(1)
    msgs = rng.randn(num_edges, h).astype(np.float32)

    num_chunks = plan_chunk_budget(num_edges, v)
    perm, rel_tgt, block_ids = plan_sorted_scatter(tgt, num_edges, v, num_chunks)

    # Chunk-ordered messages (sentinel slots get arbitrary garbage).
    slots = num_chunks * CHUNK_EDGES
    msgs_chunked = np.full((slots, h), 7.7, dtype=np.float32)
    valid = perm >= 0
    msgs_chunked[valid] = msgs[perm[valid]]

    out = sorted_segment_sum(
        jnp.asarray(msgs_chunked), jnp.asarray(rel_tgt), jnp.asarray(block_ids),
        num_nodes=v, interpret=True,
    )
    expected = np.asarray(
        jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(tgt), num_segments=v)
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-4)


def test_empty_blocks_stay_zero():
    v, h = 512, 128
    # All edges target node block 1 only.
    tgt = np.full((600,), 130, dtype=np.int32)
    msgs = np.ones((600, h), dtype=np.float32)
    num_chunks = plan_chunk_budget(600, v)
    perm, rel_tgt, block_ids = plan_sorted_scatter(tgt, 600, v, num_chunks)
    slots = num_chunks * CHUNK_EDGES
    msgs_chunked = np.full((slots, h), 3.3, dtype=np.float32)
    valid = perm >= 0
    msgs_chunked[valid] = msgs[perm[valid]]
    out = np.asarray(sorted_segment_sum(
        jnp.asarray(msgs_chunked), jnp.asarray(rel_tgt), jnp.asarray(block_ids),
        num_nodes=v, interpret=True,
    ))
    np.testing.assert_array_equal(out[:128], 0.0)
    np.testing.assert_array_equal(out[131:], 0.0)
    np.testing.assert_allclose(out[130], 600.0)


def test_gather_scatter_fused_forward_and_grad():
    v, h, num_edges = 256, 128, 2000
    src, tgt = _random_edges(num_edges, v, seed=3)
    rng = np.random.RandomState(4)
    table = jnp.asarray(rng.randn(v, h).astype(np.float32))

    num_chunks = plan_chunk_budget(num_edges, v)
    plan = build_dual_plans(src, tgt, num_edges, v, num_chunks)
    plan_j = tuple(jnp.asarray(a) for a in plan.astuple())

    out = gather_scatter_sorted(table, *plan_j, v, True)
    expected = jax.ops.segment_sum(
        jnp.take(table, jnp.asarray(src), axis=0), jnp.asarray(tgt),
        num_segments=v,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-4)

    # Gradient equivalence vs the XLA composition.
    def loss_pallas(t):
        o = gather_scatter_sorted(t, *plan_j, v, True)
        return jnp.sum(o * o)

    def loss_xla(t):
        o = jax.ops.segment_sum(
            jnp.take(t, jnp.asarray(src), axis=0), jnp.asarray(tgt),
            num_segments=v,
        )
        return jnp.sum(o * o)

    g_pallas = jax.grad(loss_pallas)(table)
    g_xla = jax.grad(loss_xla)(table)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-3)


def test_plan_block_ids_non_decreasing():
    src, tgt = _random_edges(5000, 640, seed=9)
    num_chunks = plan_chunk_budget(5000, 640)
    _, _, block_ids = plan_sorted_scatter(tgt, 5000, 640, num_chunks)
    assert np.all(np.diff(block_ids) >= 0)


def test_sorted_segment_max_matches_xla():
    v, k, num_edges = 384, 4, 3000
    rng = np.random.RandomState(5)
    tgt = rng.randint(0, v, num_edges).astype(np.int32)
    vals = rng.randn(num_edges, k).astype(np.float32)
    num_chunks = plan_chunk_budget(num_edges, v)
    perm, rel_tgt, block_ids = plan_sorted_scatter(tgt, num_edges, v, num_chunks)
    slots = num_chunks * CHUNK_EDGES
    vals_chunked = np.full((slots, k), -50.0, dtype=np.float32)
    valid = perm >= 0
    vals_chunked[valid] = vals[perm[valid]]

    from tf2_gnn_tpu.ops.spmm_pallas import sorted_segment_max

    out = np.asarray(sorted_segment_max(
        jnp.asarray(vals_chunked), jnp.asarray(rel_tgt), jnp.asarray(block_ids),
        v, True,
    ))
    expected = np.asarray(jax.ops.segment_max(
        jnp.asarray(vals), jnp.asarray(tgt), num_segments=v))
    counts = np.bincount(tgt, minlength=v)
    expected = np.where(np.isfinite(expected), expected, 0.0)
    expected[counts == 0] = 0.0
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_attention_scatter_matches_composition():
    from tf2_gnn_tpu.ops.spmm_pallas import attention_scatter

    v, k, hd, num_edges = 256, 4, 32, 2000
    h = k * hd
    rng = np.random.RandomState(7)
    tgt = rng.randint(0, v, num_edges).astype(np.int32)
    num_chunks = plan_chunk_budget(num_edges, v)
    perm, rel_tgt, block_ids = plan_sorted_scatter(tgt, num_edges, v, num_chunks)
    slots = num_chunks * CHUNK_EDGES

    expd = np.zeros((slots, k), dtype=np.float32)
    msgs = np.full((slots, h), 9.9, dtype=np.float32)
    valid = perm >= 0
    expd[valid] = rng.rand(int(valid.sum()), k).astype(np.float32)
    msgs[valid] = rng.randn(int(valid.sum()), h).astype(np.float32)
    tgtabs = np.zeros((slots,), dtype=np.int32)
    tgtabs[valid] = tgt[perm[valid]]
    sentinel = (rel_tgt >= 128)

    denom, weighted = attention_scatter(
        jnp.asarray(expd), jnp.asarray(msgs), jnp.asarray(rel_tgt),
        jnp.asarray(block_ids), jnp.asarray(tgtabs), jnp.asarray(sentinel),
        v, k, True,
    )
    # Reference composition.
    exp_ref = np.zeros((v, k)); w_ref = np.zeros((v, h))
    for s_ in np.nonzero(valid)[0]:
        exp_ref[tgtabs[s_]] += expd[s_]
        w_ref[tgtabs[s_]] += np.tile(expd[s_], hd) * msgs[s_]  # hk-major
    np.testing.assert_allclose(np.asarray(denom), exp_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(weighted), w_ref, rtol=1e-4, atol=1e-3)

    # Gradients vs the straightforward composition.
    def loss_fused(e, m):
        d, w = attention_scatter(e, m, jnp.asarray(rel_tgt),
                                 jnp.asarray(block_ids), jnp.asarray(tgtabs),
                                 jnp.asarray(sentinel), v, k, True)
        return jnp.sum(w * w) + jnp.sum(d * d)

    def loss_ref(e, m):
        w_scaled = m * jnp.tile(e, (1, hd))
        mask = jnp.asarray(~sentinel, dtype=jnp.float32)[:, None]
        d = jax.ops.segment_sum(e * mask, jnp.asarray(tgtabs), num_segments=v)
        w = jax.ops.segment_sum(w_scaled * mask, jnp.asarray(tgtabs),
                                num_segments=v)
        return jnp.sum(w * w) + jnp.sum(d * d)

    ge_f, gm_f = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(expd),
                                                      jnp.asarray(msgs))
    ge_r, gm_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(expd),
                                                    jnp.asarray(msgs))
    valid_j = jnp.asarray(valid)
    np.testing.assert_allclose(np.asarray(ge_f)[valid], np.asarray(ge_r)[valid],
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gm_f)[valid], np.asarray(gm_r)[valid],
                               rtol=1e-3, atol=1e-2)
