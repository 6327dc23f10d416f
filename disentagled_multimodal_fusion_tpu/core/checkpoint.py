"""Orbax checkpointing of train state + hyperparameters.

Reference analogue: ``trainer.save_checkpoint(path)`` after each fit with
systematic name templates (run.py:206-208, 248-249; run_synthetic.py:70-79).
Checkpoints are terminal artifacts there (no mid-training resume); we keep
the same contract but store params + hparams via Orbax so they reload onto
any device topology.
"""

from __future__ import annotations

import atexit
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

_CKPTR = None


def _checkpointer():
    """Shared StandardCheckpointer (Orbax saves are async under the hood;
    a fresh checkpointer per save would serialize on its own commit)."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(wait_for_checkpoints)
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every pending async save has committed. Called
    automatically at interpreter exit and before any restore; sweep
    drivers call it before declaring the run complete."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(
    path: str, params: Any, hparams: Optional[dict] = None, wait: bool = False
) -> str:
    """Save a pytree of params (+ JSON hparams) under ``path`` (a directory).

    The save is ASYNC: params are snapshotted to host memory synchronously
    (so callers may freely mutate/donate device buffers afterwards) and the
    file write overlaps the next cell's compute — on the bench host each
    committed save costs ~1.5 s of wall-clock, which at the UQ sweep's 7
    saves/cell was a quarter of the per-cell overhead. ``wait=True``
    restores the old fully-synchronous contract.
    """
    p = Path(path).resolve()
    p.parent.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    params = jax.device_get(params)
    ckptr.save(p, params, force=True)
    if wait:
        ckptr.wait_until_finished()
    if hparams is not None:
        (p.parent / (p.name + ".hparams.json")).write_text(
            json.dumps(hparams, default=str, indent=1)
        )
    return str(p)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore params saved by :func:`save_checkpoint` into ``target``'s
    structure."""
    wait_for_checkpoints()  # read-after-write safety for in-process reloads
    ckptr = _checkpointer()
    abstract = jax.tree.map(
        # np.asarray(...).dtype: tolerate python-scalar leaves (ints/floats)
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        jax.device_get(target),
    )
    return ckptr.restore(Path(path).resolve(), abstract)
