"""Pipeline layer: fused estimator, batch processing, evaluation, orchestration
(TPU-native analogue of reference src/pipeline.py + src/core/)."""

from .estimator import PoseEstimator, estimate_pair

__all__ = ["PoseEstimator", "estimate_pair"]
