"""Activation-function registry.

TPU-native counterpart of the reference's name->fn lookup
(``tf2_gnn/utils/param_helpers.py:21-39`` and ``utils/activation.py:7-14``).
All functions are jnp-elementwise and fuse into surrounding XLA computations.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Activation = Callable[[jnp.ndarray], jnp.ndarray]


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU, matching the reference's custom implementation
    (reference: tf2_gnn/utils/activation.py:7-14)."""
    cdf = 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3))))
    return x * cdf


def _identity(x: jnp.ndarray) -> jnp.ndarray:
    return x


_ACTIVATIONS = {
    "linear": _identity,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,  # default negative_slope 0.2 != tf (0.3)? see note below
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": gelu,
    "sigmoid": jax.nn.sigmoid,
}

# NOTE on leaky_relu: tf.nn.leaky_relu uses alpha=0.2; jax.nn.leaky_relu uses
# negative_slope=0.01. We pin alpha=0.2 for parity with the reference.
_ACTIVATIONS["leaky_relu"] = lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)


def get_activation_function(name: Optional[str]) -> Activation:
    """Map an activation name to its function (case-insensitive).

    ``None`` and ``"linear"`` both map to identity, mirroring the reference's
    behaviour where a ``None`` activation is a no-op Dense activation.
    """
    if name is None:
        return _identity
    fn = _ACTIVATIONS.get(name.lower())
    if fn is None:
        raise ValueError(f"Unknown activation function: {name}")
    return fn


def get_known_activation_names():
    return sorted(_ACTIVATIONS.keys())
