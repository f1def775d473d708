"""Probe: speed of Mosaic's tpu.dynamic_gather (jnp.take_along_axis axis=0).

Answers: can a Pallas kernel gather arbitrary rows from a VMEM-resident
table at useful rates? Mosaic only supports full-shape take_along_axis
(out.shape == table.shape), so the interesting metric is rows/s of the
hardware sublane gather. Grid repeats the gather over many chunks with
rotating indices to avoid trivial CSE.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

R = 8192      # resident table rows
C_LANES = 128
REPS = 64     # grid steps (each gathers R rows)


def build(dtype_name):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.float32 if dtype_name == "f32" else jnp.bfloat16

    def kernel(table_ref, idx_ref, out_ref):
        c = pl.program_id(0)
        idx = (idx_ref[:, :] + c) % R
        g = jnp.take_along_axis(table_ref[:, :], idx, axis=0)
        out_ref[:, :] = out_ref[:, :] + g.astype(jnp.float32)

    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(REPS,),
            in_specs=[
                pl.BlockSpec((R, C_LANES), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, C_LANES), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, C_LANES), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C_LANES), jnp.float32),
        )(table, idx)

    return run, dtype


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.kernel_micro import timed

    for name in (sys.argv[1:] or ["f32"]):
        run, dtype = build(name)
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (R, C_LANES), jnp.float32).astype(dtype)
        idx0 = jax.random.randint(jax.random.PRNGKey(1), (R, C_LANES), 0, R,
                                  jnp.int32)

        def fn(o, run=run, table=table, idx0=idx0):
            idx = (idx0 + o[:1, :1].astype(jnp.int32)) % R
            out = run(table, idx)
            return out, jnp.sum(out[0, :8])

        dt = timed(jax.jit(fn), jnp.zeros((R, C_LANES), jnp.float32))
        rows = R * REPS
        print(f"dyngather_{name}: {dt*1e3:8.3f} ms | {rows/dt/1e6:.0f}M rows/s "
              f"| {rows*C_LANES*(4 if name=='f32' else 2)/dt/1e9:.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
