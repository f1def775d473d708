"""Native data engine (libgraphpack) vs numpy fallback equivalence + prefetch."""
import numpy as np
import pytest

from tf2_gnn_tpu import native
from tf2_gnn_tpu.data.prefetch import prefetch


def test_native_library_builds_and_loads():
    # The toolchain is part of the dev environment; the library must build.
    assert native.available()


def test_pack_nodes_matches_fallback():
    rng = np.random.RandomState(0)
    feats = [rng.randn(n, 5).astype(np.float32) for n in (3, 4, 2)]
    out, n2g = native.pack_nodes(feats, v_pad=12, pad_graph_id=3)
    assert out.shape == (12, 5)
    np.testing.assert_array_equal(out[:3], feats[0])
    np.testing.assert_array_equal(out[3:7], feats[1])
    np.testing.assert_array_equal(out[7:9], feats[2])
    np.testing.assert_array_equal(out[9:], 0.0)
    np.testing.assert_array_equal(n2g, [0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3])


def test_pack_edges_offsets_and_pads():
    edges = [
        np.array([[0, 1], [1, 2]], dtype=np.int32),
        np.array([[0, 0]], dtype=np.int32),
        np.zeros((0, 2), dtype=np.int32),
    ]
    src, tgt, count = native.pack_edges(edges, [3, 2, 4], budget=8, pad_node=11)
    assert count == 3
    np.testing.assert_array_equal(src[:3], [0, 1, 3])
    np.testing.assert_array_equal(tgt[:3], [1, 2, 3])
    np.testing.assert_array_equal(src[3:], 11)
    np.testing.assert_array_equal(tgt[3:], 11)


def test_pack_edges_budget_overflow_raises():
    edges = [np.array([[0, 1], [1, 2], [2, 0]], dtype=np.int32)]
    with pytest.raises(ValueError):
        native.pack_edges(edges, [3], budget=2, pad_node=5)


def test_pack_labels():
    labels = [
        np.ones((2, 4), dtype=np.float32),
        2 * np.ones((3, 4), dtype=np.float32),
    ]
    out = native.pack_labels(labels, rows_pad=8)
    assert out.shape == (8, 4)
    np.testing.assert_array_equal(out[:2], 1.0)
    np.testing.assert_array_equal(out[2:5], 2.0)
    np.testing.assert_array_equal(out[5:], 0.0)


def test_sort_by_target_stable():
    src = np.array([5, 6, 7, 8, 9], dtype=np.int32)
    tgt = np.array([2, 0, 2, 1, 0], dtype=np.int32)
    s, t, perm = native.sort_by_target(src, tgt)
    np.testing.assert_array_equal(t, [0, 0, 1, 2, 2])
    np.testing.assert_array_equal(s, [6, 9, 8, 5, 7])  # stable within ties
    np.testing.assert_array_equal(perm, [1, 4, 3, 0, 2])


def test_in_degrees():
    edges = np.array([[0, 1], [2, 1], [1, 0]], dtype=np.int32)
    counts = native.in_degrees(edges, 4)
    np.testing.assert_array_equal(counts, [1.0, 2.0, 0.0, 0.0])


def test_prefetch_yields_all_and_propagates_errors():
    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)
        next(it)


def test_batcher_uses_native_path_consistently(tmp_path):
    """Batches built through the native engine equal the pure-python spec."""
    from tf2_gnn_tpu.data.graph_dataset import DataFold
    from tf2_gnn_tpu.data.jsonl_property_dataset import JsonLGraphPropertyDataset

    from .synthetic_data import write_jsonl_property_dataset

    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 30})
    ds = JsonLGraphPropertyDataset(params)
    ds.load_data(tmp_path, {DataFold.VALIDATION})
    for batch, labels in ds.batch_iterator(DataFold.VALIDATION):
        n_real = int(batch.num_nodes)
        # Node rows beyond the real count are zero-padding.
        np.testing.assert_array_equal(np.asarray(batch.node_features)[n_real:], 0.0)
        for t in range(batch.num_edge_types):
            count = int(np.asarray(batch.num_edges)[t])
            src = np.asarray(batch.edge_sources[t])
            np.testing.assert_array_equal(src[count:], batch.num_nodes_padded - 1)
            assert np.all(src[:count] < n_real)


def test_worker_thread_batching(tmp_path):
    from tf2_gnn_tpu.data.graph_dataset import DataFold
    from tf2_gnn_tpu.data.jsonl_property_dataset import JsonLGraphPropertyDataset

    from .synthetic_data import write_jsonl_property_dataset

    write_jsonl_property_dataset(tmp_path)
    params = JsonLGraphPropertyDataset.get_default_hyperparameters()
    params.update({"num_fwd_edge_types": 1, "max_nodes_per_batch": 30})
    plain = JsonLGraphPropertyDataset(params)
    plain.load_data(tmp_path, {DataFold.VALIDATION})
    threaded = JsonLGraphPropertyDataset(params, use_worker_threads=True)
    threaded.load_data(tmp_path, {DataFold.VALIDATION})

    plain_batches = list(plain.batch_iterator(DataFold.VALIDATION))
    threaded_batches = list(threaded.batch_iterator(DataFold.VALIDATION))
    assert len(plain_batches) == len(threaded_batches)
    for (b1, l1), (b2, l2) in zip(plain_batches, threaded_batches):
        np.testing.assert_array_equal(
            np.asarray(b1.node_features), np.asarray(b2.node_features)
        )
        np.testing.assert_array_equal(
            np.asarray(l1["target_value"]), np.asarray(l2["target_value"])
        )


def test_native_pair_planner_matches_numpy():
    """gp_pair_plan must produce byte-identical plans + edge->slot maps to
    the numpy planner (which stays authoritative for the spill path)."""
    import numpy as np

    import tf2_gnn_tpu.native as native
    import tf2_gnn_tpu.ops.pair_spmm as ps

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    for seed in range(3):
        rng = np.random.RandomState(seed)
        v = 1024
        srcs, tgts, counts = [], [], []
        for l in range(3):
            e = int(rng.randint(500, 4000))
            srcs.append(rng.randint(0, v, e))
            tgts.append(rng.randint(0, v, e))
            counts.append(e)
        f, b = ps.measure_pair_chunks(srcs, tgts, counts, v)
        bf = ((int(f * 1.1) + ps.GROUP - 1) // ps.GROUP) * ps.GROUP
        bb = ((int(b * 1.1) + ps.BWD_GROUP - 1)
              // ps.BWD_GROUP) * ps.BWD_GROUP
        p_native = ps.build_pair_plans(
            srcs, tgts, counts, v, chunk_budget_fwd=bf, chunk_budget_bwd=bb)
        native._lib, native._tried = None, True   # force the numpy path
        try:
            p_numpy = ps.build_pair_plans(
                srcs, tgts, counts, v,
                chunk_budget_fwd=bf, chunk_budget_bwd=bb)
        finally:
            native._tried = False
        for a, c in zip(p_native.astuple(), p_numpy.astuple()):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_stale_library_rebuilds_or_falls_back(tmp_path, monkeypatch):
    """A libgraphpack.so built before new entry points were added must not
    crash the module: _load() rebuilds a stale binary, and a missing symbol
    (stale binary + no toolchain) degrades to the numpy fallback."""
    import ctypes
    import subprocess

    import numpy as np

    import tf2_gnn_tpu.native as native

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")

    # Build an OLD library lacking gp_pair_plan.
    old_src = tmp_path / "old.cc"
    old_src.write_text(
        '#include <cstdint>\nextern "C" int64_t gp_expand_edges('
        "const int32_t*, int64_t, int, int32_t*) { return 0; }\n")
    old_lib = tmp_path / "libgraphpack.so"
    subprocess.run(["g++", "-shared", "-fPIC", "-o", str(old_lib),
                    str(old_src)], check=True)

    native._reset_for_tests()
    try:
        monkeypatch.setattr(native, "_LIB_PATH", old_lib)
        # No Makefile next to it -> rebuild impossible -> must fall back.
        monkeypatch.setattr(native, "_MAKE_DIR", tmp_path)
        assert native._load() is None
        # The numpy fallbacks still work end to end.
        deg = native.in_degrees(
            np.array([[0, 1], [2, 1]], np.int32), 4)
        np.testing.assert_array_equal(deg, [0.0, 2.0, 0.0, 0.0])
        assert native.pair_plan_count(
            np.array([0], np.int32), np.array([1], np.int32),
            16, 128, 128) is None
    finally:
        native._reset_for_tests()
