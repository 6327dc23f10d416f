"""Repro harness for the in-process XLA:CPU compile-volume segfault.

Context (pytest.ini): running the full test suite in ONE process
segfaults deterministically inside jaxlib's XLA:CPU compiler at ~the
117th test, once the process has accumulated ~100 compiled XLA programs
alongside an imported torch. The same test passes in isolation and in
either half of the suite, so the trigger is cumulative in-process state,
not any single program. The suite works around it by splitting across
2 pytest-xdist workers (--dist loadfile), keeping each worker's compile
volume under the threshold.

This script makes that observation reproducible without the suite:

  parent mode (default)
      Spawns child processes with escalating program counts and reports
      each child's exit status — a negative returncode is the signal
      number (-11 == SIGSEGV). Writes a JSON report next to this file
      (tools/jaxlib_segfault_repro.json) recording jax/jaxlib versions
      and the first crashing volume, or that the generic mix does not
      crash (in which case the trigger needs the suite's exact program
      mix — re-run the suite with ``-p no:xdist`` to confirm the crash
      signature before blaming this workaround).

  child mode (--child K)
      Imports torch (the suite's co-tenant), then compiles K DISTINCT
      XLA:CPU programs of the suite's mix: jit forward+grad at fresh
      shapes (cache-defeating), vmapped variants, lax.scan training
      loops, and shard_map/psum programs over an 8-device virtual mesh.

Environment matches tests/conftest.py: JAX_PLATFORMS=cpu,
xla_force_host_platform_device_count=8. Versions at authoring time:
jax 0.9.0 / jaxlib 0.9.0 (2026-08). If a newer jaxlib stops crashing
here AND a single-process suite run passes, delete this file and the
pytest.ini workaround together.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ENV = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def child(volume: int) -> None:
    os.environ.update(ENV)
    import torch  # noqa: F401  — the suite's co-tenant; part of the repro

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    assert len(jax.devices()) >= 8, (
        f"need the 8-device virtual CPU mesh, got {jax.devices()} — "
        "run via the parent mode, which strips the TPU-relay env"
    )
    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("d",))
    print(f"[child] jax {jax.__version__} devices={len(jax.devices())} "
          f"target={volume} programs", flush=True)

    for i in range(volume):
        kind = i % 4
        # fresh shapes every iteration so every program truly compiles
        d_in, d_h = 5 + i, 7 + (i % 13)
        w1 = jnp.ones((d_in, d_h)) * 0.01
        w2 = jnp.ones((d_h, 3)) * 0.01
        x = jnp.ones((8, d_in))

        if kind == 0:  # forward + grad (the dominant suite pattern)
            def loss(w1, w2, x):
                h = jnp.tanh(x @ w1)
                return jnp.sum((h @ w2) ** 2)

            jax.block_until_ready(jax.jit(jax.grad(loss))(w1, w2, x))
        elif kind == 1:  # vmapped forward
            f = jax.jit(jax.vmap(lambda r: jnp.tanh(r @ w1) @ w2))
            jax.block_until_ready(f(x))
        elif kind == 2:  # scan "training loop"
            def step(w, _):
                g = jax.grad(lambda w: jnp.sum(jnp.tanh(x @ w) @ w2))(w)
                return w - 1e-2 * g, jnp.sum(g)

            f = jax.jit(lambda w: jax.lax.scan(step, w, None, length=3))
            jax.block_until_ready(f(w1))
        else:  # shard_map + psum over the 8-device mesh
            f = jax.jit(
                shard_map(
                    lambda a: jax.lax.psum(a @ w1, "d"),
                    mesh=mesh, in_specs=P("d"), out_specs=P(),
                )
            )
            jax.block_until_ready(f(x))
        # a little interleaved torch, as the parity tests do
        if i % 10 == 0:
            torch.manual_seed(i)
            t = torch.randn(4, d_in, requires_grad=True)
            (t @ torch.randn(d_in, 3)).sum().backward()
        if (i + 1) % 25 == 0:
            print(f"[child] {i + 1}/{volume} programs compiled", flush=True)
    print("[child] completed without crash", flush=True)


def parent(volumes, timeout: float) -> int:
    import jax
    import jaxlib

    report = {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "env": ENV,
        "runs": [],
        "crashed_at": None,
    }
    for v in volumes:
        print(f"[parent] spawning child with {v} programs ...", flush=True)
        env = {**os.environ, **ENV}
        # a TPU-relay sitecustomize (when present) force-registers its
        # backend regardless of JAX_PLATFORMS; drop its gate var so the
        # child is the plain XLA:CPU jax the suite runs on
        env.pop("PALLAS_AXON_POOL_IPS", None)
        proc = subprocess.run(
            [sys.executable, __file__, "--child", str(v)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        sig = -proc.returncode if proc.returncode < 0 else None
        print(f"[parent] volume={v} rc={proc.returncode}"
              + (f" (signal {sig})" if sig else ""), flush=True)
        report["runs"].append({"volume": v, "returncode": proc.returncode,
                               "tail": proc.stdout.splitlines()[-2:]})
        if proc.returncode != 0:
            report["crashed_at"] = v
            print(proc.stderr[-1500:], flush=True)
            break
    out = Path(__file__).with_suffix(".json")
    out.write_text(json.dumps(report, indent=1))
    print(f"[parent] report -> {out}", flush=True)
    if report["crashed_at"] is None:
        print("[parent] generic mix did NOT crash — the trigger needs the "
              "suite's exact program mix; confirm with a single-process "
              "suite run (python -m pytest -p no:xdist) before removing "
              "the pytest.ini split.", flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--child", type=int, default=None, metavar="K",
                    help="internal: compile K programs then exit")
    ap.add_argument("--volumes", type=int, nargs="+",
                    default=[60, 120, 200, 300])
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child)
        return 0
    return parent(args.volumes, args.timeout)


if __name__ == "__main__":
    sys.exit(main())
