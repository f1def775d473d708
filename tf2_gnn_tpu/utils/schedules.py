"""Learning-rate schedules.

``polynomial_warmup_and_decay_schedule`` reproduces the reference's
PolynomialWarmupAndDecaySchedule
(tf2_gnn/utils/polynomial_warmup_and_decay_schedule.py:90-111): polynomial
rise initial->peak over ``warmup_steps``, then polynomial decay peak->final
over ``decay_steps`` (clamped afterwards).
"""
from typing import Optional

import jax.numpy as jnp


def polynomial_warmup_and_decay_schedule(
    learning_rate: float,
    warmup_steps: int,
    decay_steps: int,
    initial_learning_rate: float,
    final_learning_rate: float,
    power: float = 1.0,
):
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warmup = (learning_rate - initial_learning_rate) * jnp.power(
            step / warmup_steps, power
        ) + initial_learning_rate
        effective = jnp.minimum(step - warmup_steps, decay_steps)
        decay = (learning_rate - final_learning_rate) * jnp.power(
            1.0 - effective / decay_steps, power
        ) + final_learning_rate
        return jnp.where(step <= warmup_steps, warmup, decay)

    return schedule


def make_learning_rate(params: dict):
    """Reference optimizer-factory logic (graph_task_model.py:224-260): a plain
    float when no warmup/decay steps are configured, else the polynomial
    schedule with 1e-5 boundary rates substituted for the missing phase."""
    learning_rate = params.get("learning_rate", 0.001)
    num_warmup = params.get("learning_rate_warmup_steps")
    num_decay = params.get("learning_rate_decay_steps")
    if num_warmup is None and num_decay is None:
        return learning_rate

    initial_learning_rate = 1e-5
    final_learning_rate = 1e-5
    if num_warmup is None:
        num_warmup = -1  # no warmup phase
        initial_learning_rate = learning_rate
    if num_decay is None:
        num_decay = 1  # value irrelevant, must be non-zero
        final_learning_rate = learning_rate
    return polynomial_warmup_and_decay_schedule(
        learning_rate=learning_rate,
        warmup_steps=num_warmup,
        decay_steps=num_decay,
        initial_learning_rate=initial_learning_rate,
        final_learning_rate=final_learning_rate,
        power=1.0,
    )
