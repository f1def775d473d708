"""MLP with dpu-utils ``tf2utils.MLP`` semantics.

The reference depends on dpu-utils' MLP everywhere (edge message MLPs, readout
scoring/transformation MLPs, regression heads — see SURVEY.md §2 external
surface). Semantics reproduced here:

* ``hidden_layers`` may be an int N (meaning N hidden layers of size
  ``out_size``) or an explicit list of sizes (reference usage:
  tf2_gnn/layers/message_passing/gnn_edge_mlp.py:76-79 passes ints 0/1).
* Hidden layers: Dense(+bias if use_biases) -> activation -> dropout(training).
* Output layer: Dense(+bias if use_biases), NO activation, NO dropout.
"""
from typing import Callable, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import Activation, get_activation_function


class MLP(nn.Module):
    out_size: int
    hidden_layers: Union[int, Sequence[int]] = 1
    use_biases: bool = False
    activation: Union[str, Activation] = "relu"
    dropout_rate: float = 0.0

    def _hidden_sizes(self) -> Sequence[int]:
        if isinstance(self.hidden_layers, int):
            return [self.out_size] * self.hidden_layers
        return list(self.hidden_layers)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        act = (
            get_activation_function(self.activation)
            if isinstance(self.activation, str)
            else self.activation
        )
        for i, size in enumerate(self._hidden_sizes()):
            x = nn.Dense(
                size,
                use_bias=self.use_biases,
                kernel_init=nn.initializers.glorot_uniform(),
                name=f"hidden_{i}",
            )(x)
            x = act(x)
            if training and self.dropout_rate > 0.0:
                x = nn.Dropout(rate=self.dropout_rate, deterministic=False)(x)
        return nn.Dense(
            self.out_size,
            use_bias=self.use_biases,
            kernel_init=nn.initializers.glorot_uniform(),
            name="out",
        )(x)
