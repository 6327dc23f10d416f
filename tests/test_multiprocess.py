"""Multi-process (multi-host) execution of the distributed layer — for real.

Until round 5, ``parallel.distributed`` (``initialize`` / ``shard_global`` /
``process_rows``) had only single-process unit tests: the multi-host code
path had never executed under ``jax.process_count() > 1``. These tests spawn
a REAL local JAX cluster — N subprocesses joined through
``jax.distributed.initialize`` (gloo CPU collectives) via the production
env-var route (``core.setup.configure()``) — and run the full stack on the
global mesh: ``train`` (dp+tp), ``train_many`` (instance-dp), ``ServingEngine``
(row-dp), and the host-local corpus feeding path. The launcher runs the same
legs single-process on a same-shape mesh and asserts the numbers match:
multi-host execution is the same SPMD program, partitioned over processes.

Reference: none (SURVEY.md §2.3 — the reference has no distributed
capability); this is the framework's own multi-host claim being executed in
its real regime.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "mp_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_cluster(nproc: int, local_devices: int, timeout: float = 600.0):
    """Spawn nproc workers; return the parsed MPRESULT dict per process."""
    port = _free_port()
    env = dict(os.environ)
    # A fresh-boot env for each simulated host: CPU platform with its own
    # local device count, no TPU-relay registration (the axon sitecustomize
    # would claim a relay session per process), production cluster vars.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES=str(nproc),
        PYTHONPATH=str(REPO_ROOT),
    )
    procs = []
    for i in range(nproc):
        penv = dict(env, JAX_PROCESS_ID=str(i))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=str(REPO_ROOT),
                env=penv,
            )
        )
    results = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        lines = [l for l in out.splitlines() if l.startswith("MPRESULT ")]
        assert p.returncode == 0 and lines, (
            f"worker {i} failed (rc={p.returncode}):\n{out[-4000:]}"
        )
        results.append(json.loads(lines[-1][len("MPRESULT "):]))
    return results


def _single_process_reference(n_devices: int):
    """Run the same legs in-process on a same-shape (data, model) mesh."""
    from disentagled_multimodal_fusion_tpu.parallel.mesh import make_mesh
    from tests.mp_worker import run_legs

    return run_legs(make_mesh(n_devices=n_devices, model_parallel=2))


@pytest.mark.parametrize("nproc,local_devices", [(2, 2), (4, 2)])
def test_multiprocess_cluster_matches_single_process(nproc, local_devices):
    n_global = nproc * local_devices
    results = _launch_cluster(nproc, local_devices)

    # Cluster topology actually formed.
    for i, r in enumerate(results):
        assert r["process_count"] == nproc
        assert r["n_global_devices"] == n_global
        assert r["n_local_devices"] == local_devices
        assert r["mesh_shape"] == {"data": n_global // 2, "model": 2}
        assert r["process_id"] == i

    # Every process computed identical (replicated) results.
    for r in results[1:]:
        for key in ("train_loss", "many_val_acc", "many_train_loss",
                    "serve_pred", "serve_probs_sum", "serve_epistemic",
                    "corpus_mean"):
            assert r[key] == results[0][key], key

    # Host-local feeding assembled the true global corpus.
    r0 = results[0]
    assert r0["corpus_mean"] == pytest.approx(r0["corpus_mean_expected"])

    # And the cluster numbers match the single-process SPMD run.
    ref = _single_process_reference(n_global)
    np.testing.assert_allclose(
        r0["train_loss"], ref["train_loss"], rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        r0["many_train_loss"], ref["many_train_loss"], rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        r0["many_val_acc"], ref["many_val_acc"], rtol=1e-5, atol=1e-6
    )
    assert r0["serve_pred"] == [int(p) for p in ref["serve_pred"]]
    np.testing.assert_allclose(
        r0["serve_epistemic"], ref["serve_epistemic"], rtol=2e-4, atol=1e-6
    )
    assert r0["corpus_mean"] == pytest.approx(ref["corpus_mean"])


def test_shard_global_indivisible_rows_fail_loudly_multiprocess():
    """The place_global divisibility guard fires in the REAL multi-process
    regime (not just the single-process unit check): a P('data')-sharded
    array whose leading dim doesn't divide over processes must raise the
    loud ValueError, not an opaque shape error."""
    port = _free_port()
    code = (
        "import os\n"
        "from disentagled_multimodal_fusion_tpu.core.setup import configure\n"
        "configure()\n"
        "import numpy as np\n"
        "from jax.sharding import PartitionSpec as P\n"
        "from disentagled_multimodal_fusion_tpu.parallel.distributed import ("
        "global_mesh, shard_global)\n"
        "mesh = global_mesh(model_parallel=1)\n"
        "try:\n"
        "    shard_global(np.zeros((5, 3), np.float32), mesh, P('data'))\n"
        "except ValueError as e:\n"
        "    assert 'divide evenly' in str(e), e\n"
        "    print('GUARD_OK', flush=True)\n"
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        PYTHONPATH=str(REPO_ROOT),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO_ROOT), env=dict(env, JAX_PROCESS_ID=str(i)),
        )
        for i in range(2)
    ]
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0 and "GUARD_OK" in out, (
            f"worker {i} rc={p.returncode}:\n{out[-2000:]}"
        )
