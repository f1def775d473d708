"""Degree-skew robustness of the block-pair planner (SURVEY §7 hard part 3,
VERDICT r3 item 6).

Real graphs (PPI included) have power-law-ish degree distributions; the pair
planner pads (target-block, source-block) pairs into fixed E_C-slot chunks,
so the risk is silent plan blowup when edges concentrate on few targets.
Measured behaviour (benchmarks/skew_probe.py): GLOBAL Zipf skew SHRINKS
plans (fewer active block pairs, denser chunks — 0.25-1.05x uniform), and
intra-graph skew on the clustered batch shape inflates the forward plan a
bounded ~1.33x (short runs pad to the grid group). These tests pin both.
"""
import numpy as np

from tf2_gnn_tpu.ops.pair_spmm import E_C, measure_pair_chunks


def _zipf(rng, a, n, bound):
    z = rng.zipf(a, n * 3) - 1
    z = z[z < bound][:n]
    assert z.size == n
    return z


def test_global_zipf_skew_does_not_inflate_plans():
    """Uniform-random targets are the planner's near-worst case (every
    block pair active with few edges each); Zipf targets concentrate edges
    and must produce NO MORE chunks at any exponent."""
    rng = np.random.RandomState(0)
    v, e = 8064, 76800  # the PPI bench scale
    src = rng.randint(0, v, e).astype(np.int64)
    fu, bu = measure_pair_chunks(
        [src], [rng.randint(0, v, e).astype(np.int64)], [e], v)
    for a in (2.0, 1.5, 1.1):
        tgt = _zipf(rng, a, e, v).astype(np.int64)
        fz, bz = measure_pair_chunks([src], [tgt], [e], v)
        assert fz <= 1.1 * fu and bz <= 1.1 * bu, (a, fz, fu, bz, bu)


def test_clustered_intra_graph_skew_inflation_bounded():
    """The realistic PPI composition — clustered (packed disconnected)
    graphs whose WITHIN-graph degree distribution is power-law. Forward
    plan inflation vs the uniform clustered workload stays under 1.5x for
    every exponent (measured 1.33x), backward under 1.1x; slot inflation
    over real edges stays under 3x."""
    rng = np.random.RandomState(0)
    graphs, npg, e_pg = 21, 384, 3840
    v = graphs * npg

    def build(sampler):
        srcs, tgts = [], []
        for g in range(graphs):
            base = g * npg
            srcs.append(rng.randint(0, npg, e_pg) + base)
            tgts.append(sampler() + base)
        return (np.concatenate(srcs).astype(np.int64),
                np.concatenate(tgts).astype(np.int64))

    su, tu = build(lambda: rng.randint(0, npg, e_pg))
    fu, bu = measure_pair_chunks([su], [tu], [su.size], v)
    for a in (2.0, 1.5, 1.1):
        sz, tz = build(lambda a=a: _zipf(rng, a, e_pg, npg))
        fz, bz = measure_pair_chunks([sz], [tz], [sz.size], v)
        assert fz <= 1.5 * fu, (a, fz, fu)
        assert bz <= 1.1 * bu, (a, bz, bu)
        assert fz * E_C <= 3.0 * sz.size, (a, fz)
