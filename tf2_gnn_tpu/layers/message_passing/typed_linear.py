"""Per-edge-type linear maps with stacked weights.

The reference keeps one Keras Dense layer per edge type and loops in Python
(gnn_edge_mlp.py:74-80, rgat.py:74-87). On TPU we stack all types into a
single ``[L, D, H]`` parameter so the node-space transform of *all* types is
one batched MXU einsum.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class TypedLinear(nn.Module):
    """Stacked per-type linear map (no bias, glorot init — Keras Dense parity).

    Call modes:
    * ``__call__(x)`` with x [V, D] -> [L, V, out_size] (broadcast all types)
    * ``__call__(x)`` with x [L, V, D] -> [L, V, out_size] (per-type batched)
    * ``__call__(x, edge_type=l)`` with x [N, D] -> [N, out_size] (one type)

    ``compute_dtype="bfloat16"`` casts BOTH operands before the einsum
    (f32 master parameters, f32 accumulation AND output via
    preferred_element_type) — standard mixed-precision matmul. On TPU the
    MXU's default single pass already truncates f32 inputs to bf16 per
    pass, so this changes only the OPERAND BANDWIDTH, not the product
    rounding. Measured at the PPI bench shape (round 4): -1.0 ms/layer on
    an ISOLATED layer chain, but NO step-level win in the full train step
    (XLA overlaps the dense reads there) — shipped configs keep float32;
    the knob exists for larger shapes where dense bandwidth genuinely
    binds.
    """

    num_types: int
    in_size: int
    out_size: int
    compute_dtype: str = "float32"
    # Zero-pad the OUTPUT dim to this many columns at apply time (parameter
    # shape unchanged). Table builds feeding the Pallas pair kernels use it
    # to emit feature-TILE-aligned tables straight out of the matmul: the
    # MXU computes the zero columns for free, where an explicit jnp.pad of
    # the [L*V, H] table costs a full HBM round trip per layer (the
    # round-4 bisection's single largest unaccounted term — ~146 us/layer
    # in XLA's own cost model at the PPI bench shape).
    pad_out_to: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, edge_type: Optional[int] = None) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(batch_axis=(0,)),
            (self.num_types, self.in_size, self.out_size),
        )
        if self.pad_out_to is not None and self.pad_out_to > self.out_size:
            kernel = jnp.pad(
                kernel, ((0, 0), (0, 0), (0, self.pad_out_to - self.out_size))
            )
        if self.compute_dtype != "float32":
            dt = jnp.dtype(self.compute_dtype)
            x = x.astype(dt)
            kernel = kernel.astype(dt)
        if edge_type is not None:
            return jnp.dot(x, kernel[edge_type], preferred_element_type=jnp.float32)
        if x.ndim == 2:
            return jnp.einsum(
                "vd,ldh->lvh", x, kernel, preferred_element_type=jnp.float32
            )
        if x.ndim == 3:
            return jnp.einsum(
                "lvd,ldh->lvh", x, kernel, preferred_element_type=jnp.float32
            )
        raise ValueError(f"TypedLinear expects rank-2 or rank-3 input, got {x.ndim}.")
