"""Optimizer factory (optax) matching the reference's choices.

Reference: tf2_gnn/models/graph_task_model.py:224-324 — SGD(momentum) /
RMSProp(momentum, rho) / Adam, an optional polynomial warmup+decay schedule,
and mutually-exclusive gradient clipping by value / per-tensor norm / global
norm.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..utils.schedules import make_learning_rate


def _clip_by_per_tensor_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip each gradient tensor to a maximum L2 norm (tf.clip_by_norm)."""

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def make_optimizer(params: Dict[str, Any]) -> optax.GradientTransformation:
    learning_rate = make_learning_rate(params)

    name = params.get("optimizer", "Adam").lower()
    if name == "sgd":
        core = optax.sgd(learning_rate, momentum=params.get("momentum", 0.85))
    elif name == "rmsprop":
        core = optax.rmsprop(
            learning_rate,
            decay=params.get("rmsprop_rho", 0.98),
            momentum=params.get("momentum", 0.85),
            eps=1e-7,  # keras RMSprop epsilon
        )
    elif name == "adam":
        core = optax.adam(learning_rate, eps=1e-7)  # keras Adam epsilon
    else:
        raise ValueError(f'Unknown optimizer "{params.get("optimizer")}".')

    clip_value = params.get("gradient_clip_value")
    clip_norm = params.get("gradient_clip_norm")
    clip_global_norm = params.get("gradient_clip_global_norm")
    set_clips = [c for c in (clip_value, clip_norm, clip_global_norm) if c is not None]
    if len(set_clips) > 1:
        raise ValueError("Only one gradient clipping mode can be set at a time.")

    if clip_value is not None:
        return optax.chain(optax.clip(clip_value), core)
    if clip_norm is not None:
        return optax.chain(_clip_by_per_tensor_norm(clip_norm), core)
    if clip_global_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_global_norm), core)
    return core
