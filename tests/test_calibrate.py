"""Zhang calibration tool vs cv2.calibrateCamera oracle on synthetic boards
(reference tool: evaluation-runs/phone-data/camera_calibration_code/
calibrate.py)."""

import cv2
import numpy as np
import pytest

from rpe_tpu.tools.calibrate import (
    calibrate_camera,
    calibrate_with_filtering,
    make_object_points,
    per_image_errors,
    project,
)
from rpe_tpu.geometry.vp_refine import _so3_exp_np as so3_exp


def _synthetic_views(rng, n_views=8, noise=0.1, k1=-0.08, k2=0.02):
    K = np.array([[800.0, 0, 480.0], [0, 790.0, 360.0], [0, 0, 1.0]])
    dist = np.array([k1, k2])
    obj = make_object_points(7, 7, 0.04)
    obj_points, img_points, poses = [], [], []
    for _ in range(n_views):
        rvec = rng.normal(size=3) * 0.35
        tvec = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                         rng.uniform(0.5, 1.0)])
        # center the board in front of the camera
        tvec[:2] -= (so3_exp(rvec) @ obj.mean(0))[:2]
        pts = project(obj, K, dist, rvec, tvec)
        pts = pts + rng.normal(size=pts.shape) * noise
        obj_points.append(obj)
        img_points.append(pts)
        poses.append((rvec, tvec))
    return K, dist, obj_points, img_points


def test_calibration_recovers_intrinsics(rng):
    K_gt, dist_gt, obj_points, img_points = _synthetic_views(rng)
    rms, K, dist, rvecs, tvecs = calibrate_camera(
        obj_points, img_points, (960, 720))
    assert rms < 0.2, rms
    np.testing.assert_allclose(K[0, 0], K_gt[0, 0], rtol=0.01)
    np.testing.assert_allclose(K[1, 1], K_gt[1, 1], rtol=0.01)
    np.testing.assert_allclose(K[0, 2], K_gt[0, 2], rtol=0.02)
    np.testing.assert_allclose(K[1, 2], K_gt[1, 2], rtol=0.02)
    np.testing.assert_allclose(dist[0], dist_gt[0], atol=0.02)


def test_matches_opencv_calibration(rng):
    K_gt, dist_gt, obj_points, img_points = _synthetic_views(rng, noise=0.05)
    rms, K, dist, _, _ = calibrate_camera(obj_points, img_points, (960, 720))

    rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
        [o.astype(np.float32) for o in obj_points],
        [i.astype(np.float32).reshape(-1, 1, 2) for i in img_points],
        (960, 720), None, None)
    # same accuracy class as OpenCV on the same data
    np.testing.assert_allclose(K[0, 0], K_cv[0, 0], rtol=0.01)
    np.testing.assert_allclose(K[1, 1], K_cv[1, 1], rtol=0.01)
    assert rms < 2.0 * max(rms_cv, 0.05)


def test_filtering_drops_bad_views(rng):
    K_gt, dist_gt, obj_points, img_points = _synthetic_views(
        rng, n_views=12, noise=0.05)
    # corrupt two views badly
    img_points[3] = img_points[3] + rng.normal(size=img_points[3].shape) * 8.0
    img_points[7] = img_points[7] + rng.normal(size=img_points[7].shape) * 8.0
    rms, K, dist, errs, keep = calibrate_with_filtering(
        obj_points, img_points, (960, 720), error_threshold=1.0, min_keep=5)
    assert not keep[3] and not keep[7]
    assert keep.sum() >= 10 - 2
    assert rms < 0.3
    np.testing.assert_allclose(K[0, 0], K_gt[0, 0], rtol=0.015)
