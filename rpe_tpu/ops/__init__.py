"""TPU compute kernels (XLA/Pallas): pyramid, FAST/Harris, ORB describe,
MXU descriptor matching. Replaces the reference's OpenCV C++ layer
(SURVEY.md §2.2)."""

from .match import (
    cross_check_match,
    hamming_distance_matrix,
    l2sq_distance_matrix,
    ratio_test_match,
    unpack_descriptor_bits,
)
from .match_pallas import cross_check_match_fused, ratio_match_fused
from .orb import orb_detect_and_describe
from .pyramid import build_pyramid, gaussian_blur, level_shapes
from .fast import fast_score_map, harris_response_map, nonmax_suppress_3x3

__all__ = [
    "cross_check_match",
    "hamming_distance_matrix",
    "l2sq_distance_matrix",
    "ratio_test_match",
    "unpack_descriptor_bits",
    "cross_check_match_fused",
    "ratio_match_fused",
    "orb_detect_and_describe",
    "build_pyramid",
    "gaussian_blur",
    "level_shapes",
    "fast_score_map",
    "harris_response_map",
    "nonmax_suppress_3x3",
]
