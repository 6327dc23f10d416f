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


def save_checkpoint(path: str, params: Any, hparams: Optional[dict] = None) -> str:
    """Save a pytree of params (+ JSON hparams) under ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    p.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    params = jax.device_get(params)
    ckptr.save(p, params, force=True)
    ckptr.wait_until_finished()
    if hparams is not None:
        (p.parent / (p.name + ".hparams.json")).write_text(
            json.dumps(hparams, default=str, indent=1)
        )
    return str(p)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore params saved by :func:`save_checkpoint` into ``target``'s
    structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        # np.asarray(...).dtype: tolerate python-scalar leaves (ints/floats)
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        jax.device_get(target),
    )
    return ckptr.restore(Path(path).resolve(), abstract)
