"""Per-model training-metrics CSV logs + optional profiler traces.

Reference analogue: Lightning's CSVLogger(save_dir='logs/', name=model_name)
(run.py:227-230, run_luma.py:279-282) writing per-epoch scalars. Here the
jitted trainer returns whole histories as arrays, so the log is one write.

The profiler hook is NEW capability (the reference has no tracing at all,
SURVEY.md §5.1): wrap any region in ``trace()`` to drop a TensorBoard-
loadable trace under logs/traces/.
"""

from __future__ import annotations

import contextlib
from pathlib import Path
import numpy as np
import pandas as pd

from .artifacts import artifact_path


def log_training_csv(model_name: str, result, save_dir: str = "logs") -> str:
    """Write per-epoch train/val histories as logs/<model_name>/metrics.csv."""
    out = artifact_path(save_dir) / model_name
    out.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(
        {
            "epoch": np.arange(len(np.asarray(result.train_loss))),
            "train_loss": np.asarray(result.train_loss),
            "val_loss": np.asarray(result.val_loss),
            "val_acc": np.asarray(result.val_acc),
        }
    )
    path = out / "metrics.csv"
    df.to_csv(path, index=False)
    return str(path)


@contextlib.contextmanager
def trace(name: str = "trace", log_dir: str = "logs/traces", enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard / Perfetto)."""
    if not enabled:
        yield
        return
    import jax

    path = str(artifact_path(log_dir) / name)
    Path(path).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(path):
        yield
