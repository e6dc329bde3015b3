"""Multi-view scene reconstruction: RANSAC candidate matching + object-level
bundle adjustment (CosyPose stage 2)."""

from happypose_tpu.multiview.ransac import (
    MultiviewCandidates,
    multiview_candidate_matching,
)
from happypose_tpu.multiview.bundle_adjustment import MultiviewRefinement

__all__ = [
    "MultiviewCandidates",
    "multiview_candidate_matching",
    "MultiviewRefinement",
]
