"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Must run before any jax import so the XLA flags take effect.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (remote TPU relay),
# which is wrong for unit tests — slow, single-device, and shared. Set
# DMF_TEST_TPU=1 to run the suite against the real chip.
if not os.environ.get("DMF_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Artifact isolation: e2e tests drive the REAL runners, whose artifact
# templates are cwd-relative (checkpoints/, logs/). Without this, a test
# run overwrites user sweep artifacts in the repo (it has: a fixture-corpus
# test clobbered a full-scale LUMA checkpoint mid-diagnosis). The resolver
# in core/artifacts.py re-roots every relative artifact path here.
if "DMF_ARTIFACT_ROOT" not in os.environ:
    import tempfile

    os.environ["DMF_ARTIFACT_ROOT"] = tempfile.mkdtemp(
        prefix="dmf_test_artifacts_")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_modules():
    """Import the torch-only reference math modules for golden values.

    Only `utils.py` and `models/losses.py` are imported (no
    pytorch_lightning dependency). Skips if /root/reference is absent
    (e.g. CI without the reference mounted).
    """
    import importlib.util

    ref_root = Path("/root/reference")
    if not ref_root.exists():
        pytest.skip("reference repo not mounted")

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(name, ref_root / rel)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    utils = load("ref_utils", "utils.py")
    # losses.py does `import torch` etc. only — safe without lightning.
    losses = load("ref_losses", "models/losses.py")
    return {"utils": utils, "losses": losses}


# Persistent XLA compilation cache: first-use eager op compiles take seconds
# in this environment; the cache makes repeat test runs fast.
from disentagled_multimodal_fusion_tpu.core.setup import configure  # noqa: E402

configure()
