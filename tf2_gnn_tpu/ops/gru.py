"""Hand-written GRU cell with tf.keras.layers.GRUCell-parity math.

The reference uses Keras GRUCells in GGNN state updates
(tf2_gnn/layers/message_passing/ggnn.py:64-89) and the global-exchange GRU
combine (tf2_gnn/layers/graph_global_exchange.py:140-155). Keras' TF2 default
is ``reset_after=True``: the reset gate multiplies the *post-matmul* recurrent
hidden contribution and there are separate input/recurrent biases. We
reproduce exactly that computation as three fused MXU matmuls + VPU gates.

Gate order in the packed kernels follows Keras: [z | r | h].
"""
import flax.linen as nn
import jax.numpy as jnp
import jax


class GRUCell(nn.Module):
    """GRU cell: ``new_h = carry * z + (1 - z) * candidate``.

    Args (call): ``inputs`` [N, D_in], ``state`` [N, H]. Returns new state [N, H].
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
        h = self.hidden_dim
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (inputs.shape[-1], 3 * h)
        )
        recurrent_kernel = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (h, 3 * h)
        )
        # Keras reset_after=True keeps two bias vectors: one added to the input
        # projection, one to the recurrent projection.
        input_bias = self.param("input_bias", nn.initializers.zeros, (3 * h,))
        recurrent_bias = self.param("recurrent_bias", nn.initializers.zeros, (3 * h,))

        x_proj = jnp.dot(inputs, kernel, preferred_element_type=jnp.float32) + input_bias
        h_proj = (
            jnp.dot(state, recurrent_kernel, preferred_element_type=jnp.float32)
            + recurrent_bias
        )

        x_z, x_r, x_h = jnp.split(x_proj, 3, axis=-1)
        h_z, h_r, h_h = jnp.split(h_proj, 3, axis=-1)

        z = jax.nn.sigmoid(x_z + h_z)
        r = jax.nn.sigmoid(x_r + h_r)
        candidate = jnp.tanh(x_h + r * h_h)
        return z * state + (1.0 - z) * candidate
