"""Artifact-path resolution for checkpoints, logs, and reports.

The reference writes its artifacts to cwd-relative ``checkpoints/`` and
``logs/`` directories (run.py:206-208, run.py:329-343); the runners here
keep those relative templates for CLI compatibility. ``DMF_ARTIFACT_ROOT``
re-roots every relative artifact path in one place — the test suite sets
it to a temp directory so e2e tests that drive the real runners can never
clobber a user's sweep artifacts (a real incident: a fixture-corpus test
overwrote ``checkpoints/dmvae_datasetLUMA_seed0_a1e-05_normal`` from a
full-scale run mid-diagnosis), and production sweeps can point it at
scratch/NFS without touching every call site.

Absolute paths are always honoured verbatim.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENV = "DMF_ARTIFACT_ROOT"


def artifact_path(path: str | Path) -> Path:
    """Resolve an artifact path: absolute stays as-is, relative is rooted
    at ``$DMF_ARTIFACT_ROOT`` (falling back to the cwd)."""
    p = Path(path)
    if p.is_absolute():
        return p
    root = os.environ.get(_ENV)
    return (Path(root) / p).resolve() if root else p.resolve()
