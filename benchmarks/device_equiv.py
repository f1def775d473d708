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
    import test_pair_spmm as tps

    for name, fn in (
        ("pair_attention device twins",
         tpa.test_pair_attention_kernels_match_twins_on_tpu),
        ("pair_spmm device twin",
         tps.test_pair_kernel_matches_fallback_on_tpu),
    ):
        np.random.seed(0)
        fn()
        print(f"{name}: PASS", flush=True)


if __name__ == "__main__":
    main()
