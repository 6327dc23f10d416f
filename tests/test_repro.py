"""Cross-process reproducibility: the round-1 bug was runners/run.py seeding
PRNGKeys with ``hash(dataset_name)`` — salted per process via PYTHONHASHSEED,
so re-running the same (seed, dataset) cell gave different training RNG.
Now runners derive keys via ``runners.common.cell_seed`` (zlib.crc32).

The subprocess test trains one real model (LateFusion-cml on a small
HandWritten slice) through the production task-builder + train path in two
processes with DIFFERENT PYTHONHASHSEED values and asserts bit-identical
fused accuracy and parameters.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

_CHILD = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "@@ROOT@@")
from disentagled_multimodal_fusion_tpu.runners.common import cell_seed
import jax
# The env var alone is NOT enough: the axon sitecustomize's register()
# overrides the platform selection at the jax.config level, so without this
# the child silently computed on the shared TPU relay (slow compiles were
# the old flake; a relay outage was a hard failure).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from disentagled_multimodal_fusion_tpu.core.tasks import build_late_fusion_task
from disentagled_multimodal_fusion_tpu.core.train import train

# key derivation exactly as runners/run.py does it
salts = [cell_seed(s, ds, c) for s in (0, 1) for ds in ("CUB", "HandWritten", "PIE", "Scene") for c in (False, True)]
key = jax.random.PRNGKey(cell_seed(0, "HandWritten", False))
keys = jax.random.split(key, 16)

rng = np.random.default_rng(0)
xs = tuple(jnp.asarray(rng.random((120, d), np.float32)) for d in (24, 16))
y = jnp.asarray(rng.integers(0, 5, 120))
task = build_late_fusion_task(
    rng=keys[5], output_dims=[24, 16], num_classes=5, hidden_dim=(32,),
    dropout=0.1, lr=3e-3, annealing_start=50, aggregation="cml", fused=1.0,
)
res = train(
    rng=keys[8], params=task.params, loss_fn=task.loss_fn,
    data={"xs": xs, "y": y}, n_train=120, optimizer=task.optimizer,
    epochs=3, batch_size=32, drop_last=False,
    val_fn=task.val_fn, val_data={"xs": xs, "y": y},
)
leaves = jax.tree.leaves(res.params)
digest = float(sum(jnp.sum(jnp.abs(l).astype(jnp.float64)) for l in leaves))
print(json.dumps({
    "salts": salts,
    "val_acc": float(res.val_acc[-1]),
    "train_loss": float(res.train_loss[-1]),
    "param_digest": repr(digest),
}))
"""


def _run_child(hashseed: str) -> dict:
    import json

    env = dict(os.environ)
    env["PYTHONHASHSEED"] = hashseed
    env.pop("XLA_FLAGS", None)  # single-device child is fine and compiles faster
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.replace("@@ROOT@@", str(REPO_ROOT))],
        # generous: each child compiles from scratch, and on the 1-CPU host
        # a concurrent sweep can stretch that well past 10 minutes
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_training_bit_stable_across_processes():
    a = _run_child("0")
    b = _run_child("4242")
    assert a["salts"] == b["salts"], "cell_seed must not depend on PYTHONHASHSEED"
    assert a["param_digest"] == b["param_digest"], (a, b)
    assert a["val_acc"] == b["val_acc"]
    assert a["train_loss"] == b["train_loss"]


def test_package_import_initializes_no_backend():
    """Importing any module of the package must not initialize a JAX
    backend. An import-time jnp op (ops/evidence.py's old log(1e13)
    constant) made every importer dial whatever platform the process was
    pinned to — including the axon TPU relay from subprocesses that had
    set JAX_PLATFORMS=cpu, because the axon sitecustomize overrides the
    env var at the jax.config level. Imports must stay backend-free so
    callers can pick their platform after import.
    """
    import json

    child = r"""
import sys, json
sys.path.insert(0, "@@ROOT@@")
import pkgutil, importlib
import disentagled_multimodal_fusion_tpu as pkg
mods = [m.name for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + ".")]
for name in mods:
    importlib.import_module(name)
import jax
from jax._src import xla_bridge
print(json.dumps({"n_modules": len(mods), "backends": list(xla_bridge._backends)}))
""".replace("@@ROOT@@", str(REPO_ROOT))
    out = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["n_modules"] >= 40, res
    assert res["backends"] == [], f"package import initialized backends: {res}"


def test_hash_not_used_for_keys():
    """Guard: no PRNG seeding via builtin hash() in the runners."""
    runners = REPO_ROOT / "disentagled_multimodal_fusion_tpu" / "runners"
    for py in runners.glob("*.py"):
        src = py.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if "PRNGKey" in line and "hash(" in line:
                raise AssertionError(f"{py.name}:{i} seeds PRNGKey with hash(): {line.strip()}")


def test_configure_pins_matmul_precision(monkeypatch):
    """Parity-first numerics: configure() must raise matmul precision
    above the TPU DEFAULT (1-pass bf16), which can flip knife-edge EDL
    trainings into the zero-evidence collapse (PIE LateFusion seed 4:
    0.463 DEFAULT vs 0.868 under high/highest, torch 0.890). The default
    is "high" (3-pass, parity-validated on every cell, ~30% faster than
    full f32 emulation); DMF_MATMUL_PRECISION overrides it.
    """
    import jax

    from disentagled_multimodal_fusion_tpu.core.setup import configure

    monkeypatch.delenv("DMF_MATMUL_PRECISION", raising=False)
    configure()
    assert jax.config.jax_default_matmul_precision == "high"

    monkeypatch.setenv("DMF_MATMUL_PRECISION", "highest")
    configure()
    assert jax.config.jax_default_matmul_precision == "highest"
    monkeypatch.delenv("DMF_MATMUL_PRECISION")
    configure()  # restore the default for later tests in this process
    assert jax.config.jax_default_matmul_precision == "high"
