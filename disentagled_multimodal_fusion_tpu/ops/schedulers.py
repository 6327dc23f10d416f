"""Annealing schedulers as pure functions of the iteration counter.

Reference semantics: utils.py:10-42 (LinearScheduler / ExponentialScheduler).
The iteration may be a Python int or a traced jnp scalar — piecewise logic
uses ``jnp.where`` so these can live inside a ``lax.scan`` train loop.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def linear_schedule(
    iteration,
    start_value: float,
    end_value: float,
    n_iterations: int,
    start_iteration: int = 0,
):
    """Linear ramp from start_value to end_value over n_iterations."""
    m = (end_value - start_value) / n_iterations
    it = jnp.asarray(iteration, jnp.float32)
    ramp = (it - start_iteration) * m + start_value
    val = jnp.where(it <= start_iteration, start_value, ramp)
    return jnp.where(it > start_iteration + n_iterations, end_value, val)


def exponential_schedule(
    iteration,
    start_value: float,
    end_value: float,
    n_iterations: int,
    start_iteration: int = 0,
    base: float = 10.0,
):
    """Log-space linear ramp: base ** linear(log_base(start) -> log_base(end))."""
    log_start = math.log(start_value, base)
    log_end = math.log(end_value, base)
    lin = linear_schedule(iteration, log_start, log_end, n_iterations, start_iteration)
    return jnp.asarray(base, jnp.float32) ** lin
