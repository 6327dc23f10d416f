"""Persistent XLA compilation-cache behavior (core/setup.py::configure).

The runners/bench/tests all boot through ``configure()``, which enables the
persistent compilation cache off-CPU (on CPU the AOT loader rejects every
entry on feature-probe mismatch, so it stays disabled there — see the
comment in core/setup.py). These tests pin the mechanism itself: with a
cache dir configured, compiles write entries keyed by program+backend, so a
fresh process re-running the same program deserializes instead of
recompiling. BENCH_r04 measured the miss cost at 72.8 s for the f32 DMVAE
program; the cache makes every later process pay ~0.
"""

import os
import uuid

import jax
import jax.numpy as jnp
import pytest


def _unique_program(tag: float):
    """A program whose cache key differs from anything compiled before
    (the constant is baked into the HLO)."""

    @jax.jit
    def f(x):
        return (x * tag).sum()

    return f


def test_cache_dir_populates(tmp_path):
    """Compiling with a cache dir configured writes a persistent entry."""
    cache_dir = str(tmp_path / "xla_cache")
    os.makedirs(cache_dir)
    from jax._src import compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        compilation_cache.reset_cache()
        tag = float(int(uuid.uuid4()) % 100_000)
        _unique_program(tag)(jnp.ones((8, 8), jnp.float32)).block_until_ready()
        entries = os.listdir(cache_dir)
        assert entries, "persistent compilation cache never populated"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        compilation_cache.reset_cache()


def test_configure_enables_cache_off_cpu():
    """configure() points JAX at /tmp/jax_cache_<backend> on accelerators
    and leaves the cache off on CPU (where entries can never hit)."""
    backend = jax.default_backend()
    configured = jax.config.jax_compilation_cache_dir
    if backend == "cpu":
        assert configured is None or "jax_cache" not in (configured or "")
    else:
        assert configured == f"/tmp/jax_cache_{backend}"
        assert os.path.isdir(configured)


def test_configure_idempotent():
    from disentagled_multimodal_fusion_tpu.core.setup import configure

    before = jax.config.jax_compilation_cache_dir
    configure()
    configure()
    assert jax.config.jax_compilation_cache_dir == before
