"""rpe_tpu — TPU-native relative pose estimation framework.

Brand-new JAX/XLA/Pallas re-design of the capabilities of
`ofekm5/relative-pose-estimation` (reference mounted at /root/reference):
6-DoF relative camera pose (R, t-direction) between image pairs via ORB/SIFT
features, MXU brute-force matching, massively batched RANSAC essential-matrix
estimation, cheirality pose recovery, optional vanishing-point Manhattan
refinement, and the full sequence-evaluation harness (ground-truth
comparison, error metrics, trajectory plots, annotated videos) over the
reference's three datasets.

Public API mirrors the reference's flat exports (reference src/__init__.py).
"""

from .config import (
    EstimatorConfig,
    MatcherConfig,
    OrbConfig,
    RansacConfig,
    SiftConfig,
    VpConfig,
)
from .geometry.rotations import (
    CONVENTION_YUP,
    CONVENTION_ZYX,
    euler_to_rotation,
    euler_to_rotation_yup,
    euler_to_rotation_zyx,
    rotation_error,
    rotation_to_euler,
    rotation_to_euler_yup,
    rotation_to_euler_zyx,
    translation_direction_error,
)
from .io.image_loader import load_image, load_image_pair
from .pipeline.batch import BatchProcessor
from .pipeline.calibration import CameraCalibration
from .pipeline.estimator import (PoseEstimator, estimate_pair,
                                 estimate_pairs_batched,
                                 estimate_sequence_batched)
from .pipeline.evaluator import PoseEvaluator
from .pipeline.ground_truth import GroundTruthLoader
from .pipeline.orchestrator import PoseEstimationPipeline
from .pipeline.trajectory import (accumulate_trajectory, ate, gt_scales,
                                  load_kitti_poses, rpe, save_kitti_poses,
                                  umeyama)
from .viz.visualizer import Visualizer

__version__ = "0.1.0"

__all__ = [
    "PoseEstimationPipeline",
    "PoseEstimator",
    "BatchProcessor",
    "PoseEvaluator",
    "CameraCalibration",
    "GroundTruthLoader",
    "Visualizer",
    "estimate_pair",
    "estimate_pairs_batched",
    "estimate_sequence_batched",
    "EstimatorConfig",
    "OrbConfig",
    "SiftConfig",
    "MatcherConfig",
    "RansacConfig",
    "VpConfig",
    "CONVENTION_YUP",
    "CONVENTION_ZYX",
    "euler_to_rotation",
    "euler_to_rotation_yup",
    "euler_to_rotation_zyx",
    "rotation_to_euler",
    "rotation_to_euler_yup",
    "rotation_to_euler_zyx",
    "rotation_error",
    "translation_direction_error",
    "load_image",
    "load_image_pair",
    "accumulate_trajectory",
    "ate",
    "rpe",
    "umeyama",
    "gt_scales",
    "load_kitti_poses",
    "save_kitti_poses",
]
