"""TF2 helpers matching the dpu-utils `tf2utils` surface the reference uses
(MLP, unsorted_segment_(log_)softmax, get_activation_function_by_name).

Semantics mirror the pinned, unit-tested JAX re-implementations in
tf2_gnn_tpu/layers/mlp.py and tf2_gnn_tpu/ops/segment.py:104-130 — int
`hidden_layers` = that many hidden layers of size out_size; no biases by
default; dropout after each hidden activation only; stable per-segment
softmax with SMALL_NUMBER in the denominator.
"""
from typing import Callable, List, Optional, Union

import tensorflow as tf

SMALL_NUMBER = 1e-7


def gelu(x):
    import numpy as np

    return 0.5 * x * (1 + tf.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * tf.pow(x, 3))))


_ACTIVATIONS = {
    "linear": None,
    "tanh": tf.nn.tanh,
    "relu": tf.nn.relu,
    "leaky_relu": tf.nn.leaky_relu,
    "elu": tf.nn.elu,
    "selu": tf.nn.selu,
    "sigmoid": tf.math.sigmoid,
    "gelu": gelu,
}


def get_activation_function_by_name(name: Optional[str]):
    if name is None:
        return None
    return _ACTIVATIONS[name.lower()]


class MLP(tf.keras.layers.Layer):
    def __init__(
        self,
        out_size: int,
        hidden_layers: Union[int, List[int]] = 1,
        use_biases: bool = False,
        activation_fun: Optional[Callable] = tf.nn.relu,
        dropout_rate: float = 0.0,
        name: str = "MLP",
        **kwargs,
    ):
        super().__init__(name=name, **kwargs)
        if isinstance(hidden_layers, int):
            hidden_layer_sizes = [out_size] * hidden_layers
        else:
            hidden_layer_sizes = list(hidden_layers)
        if len(hidden_layer_sizes) > 1:
            assert (
                activation_fun is not None
            ), "Multiple hidden layers without an activation are just one linear layer"
        self._hidden_layer_sizes = hidden_layer_sizes
        self._out_size = out_size
        self._use_biases = use_biases
        self._activation_fun = activation_fun
        self._dropout_rate = dropout_rate

    def build(self, input_shape):
        # The reference builds MLPs eagerly with explicit static last dims
        # (e.g. gnn_edge_mlp.py:79); sublayers must be built here so Dense
        # never sees an unknown final dimension inside a traced call.
        last_dim = input_shape[-1]
        self._dense_layers = []
        # Scope variable names <mlp-name>/dense_hidden_<i>/... so every MLP's
        # weights are unique in the flat var-name space — the reference's
        # checkpointing requires global uniqueness (model_utils.py:19-34).
        with tf.name_scope(self.name):
            for i, hidden_size in enumerate(self._hidden_layer_sizes):
                layer = tf.keras.layers.Dense(
                    units=hidden_size,
                    use_bias=self._use_biases,
                    name=f"dense_hidden_{i}",
                )
                with tf.name_scope(f"dense_hidden_{i}"):
                    layer.build(tf.TensorShape((None, last_dim)))
                self._dense_layers.append(layer)
                last_dim = hidden_size
            self._out_layer = tf.keras.layers.Dense(
                units=self._out_size, use_bias=self._use_biases, name="dense_out"
            )
            with tf.name_scope("dense_out"):
                self._out_layer.build(tf.TensorShape((None, last_dim)))
        super().build(input_shape)

    def call(self, input: tf.Tensor, training: bool = False) -> tf.Tensor:
        x = input
        for layer in self._dense_layers:
            x = layer(x)
            if self._activation_fun is not None:
                x = self._activation_fun(x)
            if training and self._dropout_rate > 0.0:
                x = tf.nn.dropout(x, rate=self._dropout_rate)
        return self._out_layer(x)


def unsorted_segment_softmax(logits, segment_ids, num_segments):
    """Per-segment stable softmax: exp(x - seg_max) / (seg_sum + SMALL_NUMBER)."""
    max_per_segment = tf.math.unsorted_segment_max(
        data=logits, segment_ids=segment_ids, num_segments=num_segments
    )
    scattered_maxes = tf.gather(params=max_per_segment, indices=segment_ids)
    exped_logits = tf.exp(logits - scattered_maxes)
    sum_per_segment = tf.math.unsorted_segment_sum(
        data=exped_logits, segment_ids=segment_ids, num_segments=num_segments
    )
    scattered_sums = tf.gather(params=sum_per_segment, indices=segment_ids)
    return exped_logits / (scattered_sums + SMALL_NUMBER)


def unsorted_segment_log_softmax(logits, segment_ids, num_segments):
    """Per-segment stable log-softmax (reference rgat.py:148-151 consumer)."""
    max_per_segment = tf.math.unsorted_segment_max(
        data=logits, segment_ids=segment_ids, num_segments=num_segments
    )
    scattered_maxes = tf.gather(params=max_per_segment, indices=segment_ids)
    shifted = logits - scattered_maxes
    sum_per_segment = tf.math.unsorted_segment_sum(
        data=tf.exp(shifted), segment_ids=segment_ids, num_segments=num_segments
    )
    log_norm = tf.math.log(sum_per_segment + SMALL_NUMBER)
    return shifted - tf.gather(params=log_norm, indices=segment_ids)
