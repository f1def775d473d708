#!/bin/bash
# QM9 trajectory pin, bf16-stream edition (PARITY.md §2).
#
# Three training runs on IDENTICAL data from the IDENTICAL initial weights:
#   1. the executed reference (CPU TF 2.x + tools/refshim),
#   2. tf2_gnn_tpu with float32 edge streams (the historical pin),
#   3. tf2_gnn_tpu with bfloat16 edge streams (the shipped QM9 default
#      since round 5 — kernels' table DMA and stream traffic halve, +7%
#      measured molecules/s at the bench shape).
# The comparison bounds the bf16 storage-rounding divergence envelope next
# to the f32 pin. Config: the shipped QM9_RGCN hyperparameters
# (RMSProp rho=0.98, momentum 0.85, clip 1.0, 8 layers, layernorm,
# leaky_relu — harness/default_hypers/QM9_RGCN.json) at hidden 32, with
# dropout zeroed and global exchange disabled on both sides (RNG streams
# cannot be aligned across TF and JAX; PARITY.md §2 preamble).
#
# Usage: bash tools/parity/qm9_dtype_pin.sh [out_dir]   (~10 min on 1 CPU)
set -eu
OUT=${1:-/tmp/qm9_dtype_pin}
EPOCHS=${EPOCHS:-15}
cd "$(dirname "$0")/../.."
mkdir -p "$OUT"

# Fixed-seed QM9-format dataset (60 molecules per fold).
python - "$OUT" <<'EOF'
import sys
from pathlib import Path

sys.path.insert(0, ".")
from tests.synthetic_data import write_qm9_dataset

write_qm9_dataset(Path(sys.argv[1]) / "data", num_graphs=60, feature_dim=6,
                  seed=7)
EOF

# Shared hyperparameters — identical dict handed to BOTH implementations.
BASE='"gnn_hidden_dim": 32, "gnn_num_layers": 8,
  "gnn_use_inter_layer_layernorm": true,
  "gnn_message_activation_function": "leaky_relu",
  "gnn_aggregation_function": "sum",
  "gnn_dense_every_num_layers": 32,
  "gnn_residual_every_num_layers": 2,
  "gnn_global_exchange_every_num_layers": 32,
  "gnn_initial_node_representation_activation": "tanh",
  "gnn_layer_input_dropout_rate": 0.0,
  "optimizer": "RMSProp", "rmsprop_rho": 0.98, "momentum": 0.85,
  "learning_rate": 0.000572, "gradient_clip_value": 1.0'

echo "== reference (TF) =="
python tools/refrun/refrun.py train --task QM9 --model RGCN \
    --data-path "$OUT/data" --epochs "$EPOCHS" --out "$OUT/ref" \
    --model-overrides "{$BASE}" | tail -3

for DTYPE in float32 bfloat16; do
    echo "== ours, $DTYPE edge streams =="
    python tools/parity/run_ours.py --task QM9 --model RGCN \
        --data-path "$OUT/data" --epochs "$EPOCHS" \
        --init-ckpt "$OUT/ref/ckpt_init.hdf5" \
        --model-overrides "{$BASE, \"gnn_edge_dtype\": \"$DTYPE\"}" \
        --out "$OUT/ours_$DTYPE" | tail -3
done

python - "$OUT" <<'EOF'
import json
import sys
from pathlib import Path

out = Path(sys.argv[1])
ref = json.loads((out / "ref" / "trajectory.json").read_text())["trajectory"]
f32 = json.loads((out / "ours_float32" / "trajectory.json").read_text())["trajectory"]
bf16 = json.loads((out / "ours_bfloat16" / "trajectory.json").read_text())["trajectory"]

print(f"{'ep':>3} {'ref loss':>10} {'f32 loss':>10} {'bf16 loss':>10} "
      f"{'f32 vs ref':>10} {'bf16 vs ref':>11} {'bf16 vs f32':>11}")
mx = {"f32_ref": 0.0, "bf16_ref": 0.0, "bf16_f32": 0.0}
for r, a, b in zip(ref, f32, bf16):
    rl, al, bl = (abs(r["valid_loss"]), abs(a["valid_loss"]),
                  abs(b["valid_loss"]))
    d_ar = abs(al - rl) / max(rl, 1e-9) * 100
    d_br = abs(bl - rl) / max(rl, 1e-9) * 100
    d_ba = abs(bl - al) / max(al, 1e-9) * 100
    mx["f32_ref"] = max(mx["f32_ref"], d_ar)
    mx["bf16_ref"] = max(mx["bf16_ref"], d_br)
    mx["bf16_f32"] = max(mx["bf16_f32"], d_ba)
    print(f"{r['epoch']:>3} {rl:>10.4f} {al:>10.4f} {bl:>10.4f} "
          f"{d_ar:>9.2f}% {d_br:>10.2f}% {d_ba:>10.2f}%")
print("max divergence (valid loss):", json.dumps(mx))
EOF
