"""Orbax checkpointing of train state + hyperparameters.

Reference analogue: ``trainer.save_checkpoint(path)`` after each fit with
systematic name templates (run.py:206-208, 248-249; run_synthetic.py:70-79).
Checkpoints are terminal artifacts there (no mid-training resume); we keep
the same contract but store params + hparams via Orbax so they reload onto
any device topology.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from .artifacts import artifact_path

_CKPTR = None


def _checkpointer():
    """Shared StandardCheckpointer (Orbax saves are async under the hood;
    a fresh checkpointer per save would serialize on its own commit)."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every pending async save has committed.

    Must be called from NORMAL program flow, not atexit: CPython runs
    ``threading._register_atexit`` hooks (which mark every
    ThreadPoolExecutor as shut down) BEFORE atexit callbacks, so Orbax's
    async commit machinery raises "cannot schedule new futures after
    interpreter shutdown" if first awaited that late — measured here, not
    theorised. restore_checkpoint() and every sweep driver call this at
    their read/completion points.
    """
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(
    path: str, params: Any, hparams: Optional[dict] = None, wait: bool = True
) -> str:
    """Save a pytree of params (+ JSON hparams) under ``path`` (a directory).

    ``wait=False`` makes the save ASYNC: params are snapshotted to host
    memory synchronously (so callers may freely mutate/donate device
    buffers afterwards) and the file write overlaps subsequent compute —
    on the bench host each committed save costs ~1.5 s of wall-clock,
    which at the UQ sweep's 7 saves/cell was a quarter of the per-cell
    overhead. Async callers MUST reach a wait_for_checkpoints() (the sweep
    drivers do, at their rows-checkpoint and completion points) before the
    process exits, or in-flight saves are lost — there is deliberately no
    atexit net (see wait_for_checkpoints).
    """
    p = artifact_path(path)
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
    return ckptr.restore(artifact_path(path), abstract)
