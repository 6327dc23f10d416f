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
    if start_value <= 0 or end_value <= 0:
        # the reference crashes identically (utils.py:35 math.log(0)) — e.g.
        # DisentangledSSL's lmd ramp with the DEFAULT lmd_start_value=0 and
        # any lmd_end_value>0; surface the cause instead of a domain error
        raise ValueError(
            f"exponential_schedule needs start_value and end_value > 0 "
            f"(got {start_value}, {end_value}); the log-space ramp is "
            f"undefined at 0 — use a small positive start (e.g. 1e-4) or "
            f"linear_schedule"
        )
    log_start = math.log(start_value, base)
    log_end = math.log(end_value, base)
    lin = linear_schedule(iteration, log_start, log_end, n_iterations, start_iteration)
    return jnp.asarray(base, jnp.float32) ** lin
