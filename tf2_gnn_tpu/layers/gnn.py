"""GNN encoder stack.

Reference: tf2_gnn/layers/gnn.py:30-329. Stacks ``num_layers`` message-passing
layers over a padded GraphBatch with (in reference order, gnn.py:276-329):

1. initial dense projection [V, D] -> [V, H] + activation,
2. per layer: input dropout (training), mean-residual every k layers
   (``(cur + last) / 2``, skipped at layer 0), the MP layer, global exchange
   every k layers (only for layer_idx > 0), optional LayerNorm, dense layer
   every k layers (*including* layer 0),
3. returns the final [V, H] plus all intermediate MP outputs (captured *raw*,
   before exchange/layernorm/dense — reference gnn.py:305).

Everything is static-shape; the whole stack jits into one XLA program.
"""
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph_batch import GraphBatch
from ..ops.activations import get_activation_function
from .global_exchange import get_global_exchange_class
from .message_passing import get_message_passing_class


def _hashable(value):
    if isinstance(value, list):
        return tuple(_hashable(v) for v in value)
    return value


class GNN(nn.Module):
    message_calculation_class: str = "rgcn"
    hidden_dim: int = 16
    num_layers: int = 4
    dense_every_num_layers: int = 2
    residual_every_num_layers: int = 2
    use_inter_layer_layernorm: bool = False
    initial_node_representation_activation: str = "tanh"
    dense_intermediate_layer_activation: str = "tanh"
    layer_input_dropout_rate: float = 0.0
    # Rematerialize each message-passing layer in the backward pass
    # (jax.checkpoint): trades recompute for activation memory, the standard
    # lever for deep stacks / giant graphs.
    use_remat: bool = False
    global_exchange_mode: str = "gru"
    global_exchange_every_num_layers: int = 2
    global_exchange_weighting_fun: str = "softmax"
    global_exchange_num_heads: int = 4
    global_exchange_dropout_rate: float = 0.2
    # Flavour-specific message-passing hypers as a hashable sorted tuple
    # (e.g. (("aggregation_function", "sum"), ("num_heads", 3), ...)).
    mp_hypers: Tuple[Tuple[str, Any], ...] = ()

    @classmethod
    def get_default_hyperparameters(cls, mp_style: Optional[str] = None) -> Dict[str, Any]:
        """Flat default hyperparameter dict; merges the chosen MP flavour's
        defaults under the same namespace (reference gnn.py:53-79)."""
        these_hypers: Dict[str, Any] = {
            "message_calculation_class": mp_style or "rgcn",
            "initial_node_representation_activation": "tanh",
            "dense_intermediate_layer_activation": "tanh",
            "num_layers": 4,
            "dense_every_num_layers": 2,
            "residual_every_num_layers": 2,
            "use_inter_layer_layernorm": False,
            "hidden_dim": 16,
            "layer_input_dropout_rate": 0.0,
            "use_remat": False,
            "global_exchange_mode": "gru",
            "global_exchange_every_num_layers": 2,
            "global_exchange_weighting_fun": "softmax",
            "global_exchange_num_heads": 4,
            "global_exchange_dropout_rate": 0.2,
        }
        mp_class = get_message_passing_class(these_hypers["message_calculation_class"])
        params = mp_class.get_default_hyperparameters()
        params.update(these_hypers)
        return params

    @classmethod
    def from_params(cls, params: Dict[str, Any], name: Optional[str] = None) -> "GNN":
        """Build from a flat hyperparameter dict (GNN + MP hypers mixed)."""
        import dataclasses

        own_fields = {
            f.name for f in dataclasses.fields(cls) if f.init and f.name != "mp_hypers"
        }
        own_fields -= {"parent", "name"}
        gnn_kwargs = {k: _hashable(v) for k, v in params.items() if k in own_fields}

        mp_class = get_message_passing_class(
            params.get("message_calculation_class", "rgcn")
        )
        mp_fields = {f.name for f in dataclasses.fields(mp_class) if f.init}
        mp_fields -= {"parent", "name"}
        mp_hypers = tuple(
            sorted((k, _hashable(v)) for k, v in params.items() if k in mp_fields)
        )
        return cls(mp_hypers=mp_hypers, name=name, **gnn_kwargs)

    @nn.compact
    def __call__(
        self, batch: GraphBatch, training: bool = False
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        mp_class = get_message_passing_class(self.message_calculation_class)
        mp_params = dict(self.mp_hypers)
        mp_params["hidden_dim"] = self.hidden_dim

        initial_act = get_activation_function(
            self.initial_node_representation_activation
        )
        dense_act = get_activation_function(self.dense_intermediate_layer_activation)

        cur = initial_act(
            nn.Dense(
                self.hidden_dim,
                use_bias=False,
                kernel_init=nn.initializers.glorot_uniform(),
                name="initial_node_projection",
            )(batch.node_features)
        )

        last = cur
        all_reprs = [cur]
        for layer_idx in range(self.num_layers):
            if training and self.layer_input_dropout_rate > 0.0:
                cur = nn.Dropout(
                    rate=self.layer_input_dropout_rate, deterministic=False
                )(cur)

            # Mean residual every k layers (reference gnn.py:291-296).
            if layer_idx % self.residual_every_num_layers == 0:
                tmp = cur
                if layer_idx > 0:
                    cur = (cur + last) / 2.0
                last = tmp

            # Message passing (one unshared layer per depth).
            layer_cls = (
                nn.remat(mp_class, static_argnums=(2,))
                if self.use_remat
                else mp_class
            )
            cur = layer_cls.from_params(mp_params, name=f"mp_layer_{layer_idx}")(
                cur, batch, training
            )
            # Intermediate representations are captured *before*
            # exchange/layernorm/dense (reference gnn.py:305).
            all_reprs.append(cur)

            # Global exchange every k layers, but never at layer 0
            # (reference gnn.py:307-315).
            if layer_idx and layer_idx % self.global_exchange_every_num_layers == 0:
                exchange_class = get_global_exchange_class(self.global_exchange_mode)
                cur = exchange_class(
                    hidden_dim=self.hidden_dim,
                    weighting_fun=self.global_exchange_weighting_fun,
                    num_heads=self.global_exchange_num_heads,
                    dropout_rate=self.global_exchange_dropout_rate,
                    name=f"global_exchange_{layer_idx}",
                )(cur, batch.node_to_graph, batch.num_graphs_padded, training,
                  batch.spmd_axis)

            if self.use_inter_layer_layernorm:
                # Keras LayerNormalization defaults to epsilon=1e-3.
                cur = nn.LayerNorm(epsilon=1e-3, name=f"layernorm_{layer_idx}")(cur)

            # Dense layer every k layers, *including* layer 0
            # (reference gnn.py:324-327).
            if layer_idx % self.dense_every_num_layers == 0:
                cur = dense_act(
                    nn.Dense(
                        self.hidden_dim,
                        use_bias=False,
                        kernel_init=nn.initializers.glorot_uniform(),
                        name=f"dense_{layer_idx}",
                    )(cur)
                )

        return cur, tuple(all_reprs)
