"""Polynomial warmup+decay schedule parity (reference
polynomial_warmup_and_decay_schedule.py:90-111 + the optimizer factory's
missing-phase substitutions, graph_task_model.py:238-260)."""
import numpy as np
import optax

from tf2_gnn_tpu.harness.optimizers import make_optimizer
from tf2_gnn_tpu.utils.schedules import (
    make_learning_rate,
    polynomial_warmup_and_decay_schedule,
)


def test_warmup_then_decay_shape():
    sched = polynomial_warmup_and_decay_schedule(
        learning_rate=1e-2, warmup_steps=10, decay_steps=100,
        initial_learning_rate=1e-5, final_learning_rate=1e-4, power=1.0,
    )
    np.testing.assert_allclose(float(sched(0)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-2, rtol=1e-6)
    # Midway through warmup: linear interpolation (power=1).
    np.testing.assert_allclose(float(sched(5)), 1e-5 + (1e-2 - 1e-5) * 0.5,
                               rtol=1e-5)
    # Midway through decay.
    np.testing.assert_allclose(float(sched(60)), 1e-4 + (1e-2 - 1e-4) * 0.5,
                               rtol=1e-5)
    # Clamped after decay completes.
    np.testing.assert_allclose(float(sched(10_000)), 1e-4, rtol=1e-5)


def test_make_learning_rate_missing_phase_substitutions():
    # No schedule params: plain float.
    assert make_learning_rate({"learning_rate": 0.003}) == 0.003

    # Warmup only: constant at peak after warmup (decay to final == peak).
    sched = make_learning_rate(
        {"learning_rate": 0.01, "learning_rate_warmup_steps": 10}
    )
    np.testing.assert_allclose(float(sched(0)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(sched(500)), 0.01, rtol=1e-5)

    # Decay only: starts at peak (warmup_steps=-1 skips the warmup branch).
    sched = make_learning_rate(
        {"learning_rate": 0.01, "learning_rate_decay_steps": 100}
    )
    np.testing.assert_allclose(float(sched(1000)), 1e-5, rtol=1e-4)
    assert float(sched(0)) <= 0.01


def test_optimizer_uses_schedule():
    import jax.numpy as jnp

    opt = make_optimizer(
        {"optimizer": "SGD", "momentum": 0.0, "learning_rate": 1.0,
         "learning_rate_warmup_steps": 10}
    )
    params = {"w": jnp.ones((2,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((2,))}
    updates, state = opt.update(grads, state, params)
    # At step 0 the scheduled lr is the tiny initial rate, not 1.0.
    assert abs(float(updates["w"][0])) < 1e-3
