"""Data layer: multi-view .mat loaders with UQ perturbations, synthetic
generators, LUMA compile/load pipeline, and device-resident batching."""

from .multiview import (
    MultiViewDataset,
    HandWritten,
    Scene,
    PIE,
    Caltech,
    CUB,
    DATASET_REGISTRY,
)
from .synthetic import SimpleTwoModalPlus, generate_data_simple, make_simple_plus_splits
