"""Evaluation engine + metrics flattening/reporting."""

from .analysis import (
    evaluate_subjective_model,
    evaluate_subjective_model_with_shared,
    evaluate_task,
    flatten_sample_info,
    flatten_sample_info_datasets,
    build_metrics_dataframe,
    build_metrics_dataframe_datasets,
)
