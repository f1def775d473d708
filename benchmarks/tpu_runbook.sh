#!/bin/bash
# One-pass TPU validation + measurement of everything that can only be
# checked on the real chip. Run on a QUIET host (no concurrent pytest —
# 1-CPU contention skews the differenced timings). Each stage appends to
# $OUT so a mid-run tunnel drop loses nothing.
#
# Usage: bash benchmarks/tpu_runbook.sh [out_dir]
set -u
OUT=${1:-/tmp/tpu_runbook}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
    timeout 120 python -c "import jax; print(jax.devices())" 2>&1 \
        | grep -v WARNING | tail -1
}

echo "== probe ==" | tee "$OUT/00_probe.log"
probe | tee -a "$OUT/00_probe.log"
if ! grep -q -i "axon\|tpu" "$OUT/00_probe.log"; then
    echo "TPU tunnel not available — aborting." | tee -a "$OUT/00_probe.log"
    exit 1
fi

echo "== device-kernel equivalence (pair SpMM + attention twins) =="
# NOTE: NOT pytest — tests/conftest.py forces the CPU platform, so the
# TPU-gated equivalence tests always skip under pytest; this driver runs
# the same test functions against the real chip.
timeout 1800 python benchmarks/device_equiv.py \
    > "$OUT/10_kernel_equiv.log" 2>&1
EQUIV_RC=$?
tail -3 "$OUT/10_kernel_equiv.log"
if [ "$EQUIV_RC" -ne 0 ]; then
    echo "Kernel equivalence FAILED (rc=$EQUIV_RC) — benchmark numbers" \
         "would be meaningless; aborting." | tee -a "$OUT/10_kernel_equiv.log"
    exit 1
fi

echo "== kernel re-baseline (device-chained, tunnel-proof) =="
timeout 1800 python benchmarks/kernel_rebaseline.py \
    > "$OUT/15_kernel_rebaseline.log" 2>&1
tail -8 "$OUT/15_kernel_rebaseline.log"

echo "== pair kernel micro-bench (fwd/bwd/grad) =="
timeout 1800 python benchmarks/pair_bench.py > "$OUT/20_pair_bench.log" 2>&1
tail -8 "$OUT/20_pair_bench.log"

echo "== reference-default edge MLP (target-state 1-hidden pair kernel) =="
timeout 1800 python benchmarks/edge_mlp_probe.py pair scatter \
    > "$OUT/22_edge_mlp.log" 2>&1
tail -3 "$OUT/22_edge_mlp.log"

echo "== degree-skew throughput (uniform vs zipf) =="
timeout 1800 python benchmarks/skew_probe.py > "$OUT/24_skew.log" 2>&1
tail -3 "$OUT/24_skew.log"

echo "== attention per-kernel split (max/expd/agg/fwd/grad) =="
timeout 1800 python benchmarks/attention_probe.py \
    > "$OUT/25_attention_probe.log" 2>&1
tail -7 "$OUT/25_attention_probe.log"

echo "== RGAT learning A/B (pair-attention vs XLA trajectories) =="
timeout 2400 python benchmarks/convergence.py 8 rgat-ab \
    > "$OUT/27_rgat_ab.log" 2>&1
tail -2 "$OUT/27_rgat_ab.log"

echo "== edge-MLP learning A/B (default-config pair kernel vs XLA) =="
timeout 2400 python benchmarks/convergence.py 8 edge-mlp-ab \
    > "$OUT/28_edge_mlp_ab.log" 2>&1
tail -2 "$OUT/28_edge_mlp_ab.log"

echo "== QM9-shaped stream-dtype learning A/B (f32 vs bf16) =="
timeout 2400 python benchmarks/convergence.py 10 qm9-dtype-ab \
    > "$OUT/29_qm9_dtype_ab.log" 2>&1
tail -2 "$OUT/29_qm9_dtype_ab.log"

echo "== typed-plan learning A/B (round-5 shipped form vs XLA) =="
timeout 2400 python benchmarks/convergence.py 10 typed-ab \
    > "$OUT/29b_typed_ab.log" 2>&1
tail -2 "$OUT/29b_typed_ab.log"

echo "== RGAT flavour sweep (XLA vs fused) =="
timeout 2400 python benchmarks/flavour_sweep.py rgat \
    > "$OUT/30_rgat_sweep.log" 2>&1
tail -4 "$OUT/30_rgat_sweep.log"

echo "== end-to-end epoch throughput (host pipeline + eval cache) =="
timeout 1800 python benchmarks/epoch_throughput.py \
    > "$OUT/35_epoch.log" 2>&1
tail -5 "$OUT/35_epoch.log"

echo "== headline bench (driver metric) =="
timeout 1800 python bench.py > "$OUT/40_bench.log" 2>&1
tail -2 "$OUT/40_bench.log"

echo "== full flavour sweep (PERFORMANCE.md table) =="
timeout 7200 python benchmarks/flavour_sweep.py \
    > "$OUT/50_full_sweep.log" 2>&1
tail -14 "$OUT/50_full_sweep.log"

echo "All stages done; logs in $OUT"
