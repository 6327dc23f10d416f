"""Process-level JAX configuration shared by runners/tests/bench."""

from __future__ import annotations

import os


def configure(cache_dir: str = "/tmp/jax_cache") -> None:
    """Enable the persistent XLA compilation cache (compiles in this
    environment are expensive; the cache makes re-runs near-instant).

    The cache is namespaced per backend — entries serialized by the TPU
    (axon) runtime fail to deserialize under the CPU backend and vice versa.
    """
    # Quiet the cpu_aot_loader machine-feature-mismatch ERROR spam: cache
    # entries compiled with a wider ISA are rejected-and-recompiled, which
    # is fine but extremely noisy.
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

    # Join a multi-host cluster BEFORE the first backend use (env-var
    # driven no-op single-process): jax.distributed.initialize must precede
    # jax.default_backend() below, or it raises on real pods.
    from ..parallel.distributed import initialize as _dist_init

    _dist_init()

    import jax

    # Parity-first numerics: TPU's DEFAULT precision computes f32 matmuls
    # as 1-pass bf16 multiplies, and the EDL stack (saturated-exp evidence
    # -> digamma losses) sits on a knife edge where that perturbation
    # occasionally flips a training trajectory into the zero-evidence
    # collapse (observed: PIE LateFusion seed 4 — 0.463 under DEFAULT vs
    # 0.868 under f32, torch 0.890). "high" (3-pass bf16 synthesis,
    # ~f32-accurate) restores per-seed tracking of the torch replica to
    # within one test sample on the PIE knife-edge — no collapse on any
    # seed — and every other parity cell (round-2
    # validation: all 6 models x 4 datasets + synthetic under both "high"
    # and "highest" — same gaps), at ~30% less step time than "highest"'s
    # full f32 emulation (bench: 9.2 vs 13.1 ms/epoch). Explicit bf16
    # compute stays available via the --dtype bfloat16 product knob;
    # DMF_MATMUL_PRECISION=highest|high|default overrides for experiments.
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("DMF_MATMUL_PRECISION", "high"),
    )

    # The axon sitecustomize force-registers the TPU plugin and overrides
    # the JAX_PLATFORMS env var via jax.config; re-apply the user's request
    # so `JAX_PLATFORMS=cpu pytest` really runs on CPU.
    want = os.environ.get("JAX_PLATFORMS")
    if want and want != "axon":
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

    backend = jax.default_backend()
    if backend == "cpu":
        # XLA:CPU AOT cache entries record compile-option pseudo-features
        # (+prefer-no-gather/scatter) that never match the host feature
        # probe, so the persistent cache can't hit on CPU — it only spams
        # rejection errors. Rely on the in-process jit cache instead.
        return
    cache_dir = f"{cache_dir}_{backend}"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
