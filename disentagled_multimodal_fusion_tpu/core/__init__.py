"""Training core: jitted scan-per-epoch harness, optimizers/schedules,
checkpointing, RNG discipline."""

from .train import OptimizerConfig, TrainResult, train
from .checkpoint import save_checkpoint, restore_checkpoint
