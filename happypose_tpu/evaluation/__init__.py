"""Evaluation: pose-error meters, AUC, BOP export, prediction running."""

from happypose_tpu.evaluation.meters import (
    PoseErrorMeter,
    compute_auc_posecnn,
    match_poses,
)
from happypose_tpu.evaluation.bop_export import (
    predictions_to_bop_csv,
    save_bop_csv,
)

__all__ = [
    "PoseErrorMeter",
    "compute_auc_posecnn",
    "match_poses",
    "predictions_to_bop_csv",
    "save_bop_csv",
]
