"""End-to-end pose parity on a real image pair: fused TPU-native estimator
vs the OpenCV reference path (BASELINE.md parity contract: <= 0.5 deg
rotation delta; test budget is slightly looser to absorb OpenCV RANSAC
nondeterminism)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpe_tpu.pipeline.estimator import PoseEstimator, estimate_pair
from rpe_tpu.config import EstimatorConfig, OrbConfig, MatcherConfig, RansacConfig
from rpe_tpu.geometry import rotation_error

P1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
P2 = "/root/reference/evaluation-runs/single-pair/images/000015.png"


@pytest.fixture(scope="module")
def pair():
    img1 = cv2.imread(P1, cv2.IMREAD_GRAYSCALE)
    img2 = cv2.imread(P2, cv2.IMREAD_GRAYSCALE)
    assert img1 is not None and img2 is not None
    h, w = img1.shape
    K = np.array([
        [924.82939686 * w / 960, 0, 468.24930789 * w / 960],
        [0, 920.4766382 * h / 720, 353.65863024 * h / 720],
        [0, 0, 1.0],
    ])
    return img1, img2, K


def _opencv_reference(img1, img2, K):
    orb = cv2.ORB_create(nfeatures=4000, scaleFactor=1.1, nlevels=12,
                         fastThreshold=15, scoreType=cv2.ORB_HARRIS_SCORE)
    kp1, d1 = orb.detectAndCompute(img1, None)
    kp2, d2 = orb.detectAndCompute(img2, None)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:500]
    pts1 = np.float32([kp1[m.queryIdx].pt for m in ms])
    pts2 = np.float32([kp2[m.trainIdx].pt for m in ms])
    E, _ = cv2.findEssentialMat(pts1, pts2, K, method=cv2.RANSAC,
                                prob=0.999, threshold=1.0)
    _, R, t, _ = cv2.recoverPose(E, pts1, pts2, K)
    return R, t.flatten()


def test_pose_parity_vs_opencv(pair):
    img1, img2, K = pair
    R_cv, t_cv = _opencv_reference(img1, img2, K)

    est = PoseEstimator(K, nfeatures=4000)
    dbg = est.estimate_with_debug(img1, img2)
    assert dbg["num_matches"] >= 400
    r_delta = float(rotation_error(jnp.asarray(dbg["R"]), jnp.asarray(R_cv)))
    t_dot = abs(float(np.dot(dbg["t"].flatten(), t_cv)))
    assert r_delta < 0.8, f"rotation delta vs OpenCV: {r_delta:.3f} deg"
    # t is far noisier than R on this near-pure-rotation pair; 0.99 ~ 8 deg
    assert t_dot > 0.99, f"translation agreement |t.t_cv| = {t_dot:.4f}"


def test_estimate_returns_reference_shapes(pair):
    img1, img2, K = pair
    est = PoseEstimator(K)
    R, t = est.estimate(img1, img2)
    assert R.shape == (3, 3)
    assert t.shape == (3, 1)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(t), 1.0, atol=1e-4)


def test_invalid_constructor_args(pair):
    _, _, K = pair
    with pytest.raises(ValueError):
        PoseEstimator(K, feature_method="SURF")
    with pytest.raises(ValueError):
        PoseEstimator(K, norm_type="L1")


def test_estimate_pair_deterministic(pair):
    img1, img2, K = pair
    cfg = EstimatorConfig(
        orb=OrbConfig(nfeatures=1000, nlevels=4, max_kpts=1024),
        matcher=MatcherConfig(max_matches=256),
        ransac=RansacConfig(num_hypotheses=512),
    )
    i1 = jnp.asarray(img1, jnp.float32)
    i2 = jnp.asarray(img2, jnp.float32)
    key = jax.random.PRNGKey(7)
    a = estimate_pair(i1, i2, jnp.asarray(K, jnp.float32), key, cfg=cfg)
    b = estimate_pair(i1, i2, jnp.asarray(K, jnp.float32), key, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(a["R"]), np.asarray(b["R"]))
    np.testing.assert_array_equal(np.asarray(a["t"]), np.asarray(b["t"]))


def test_sequence_batched_matches_pairs_batched(pair):
    """estimate_sequence_batched (one detection per unique frame) must be
    bit-identical to estimate_pairs_batched on the same pairs — detection
    sharing may not change any numerics."""
    from rpe_tpu.pipeline.estimator import (
        estimate_pairs_batched, estimate_sequence_batched)

    img1, img2, K = pair
    cfg = EstimatorConfig(
        orb=OrbConfig(nfeatures=800, nlevels=4, max_kpts=1024),
        matcher=MatcherConfig(max_matches=256),
        ransac=RansacConfig(num_hypotheses=256),
    )
    i1 = jnp.asarray(img1, jnp.float32)
    i2 = jnp.asarray(img2, jnp.float32)
    Kj = jnp.asarray(K, jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))

    seq = estimate_sequence_batched(jnp.stack([i1, i2, i1]), Kj, keys,
                                    cfg=cfg)
    prs = estimate_pairs_batched(jnp.stack([i1, i2]), jnp.stack([i2, i1]),
                                 Kj, keys, cfg=cfg)
    for k in ("R", "t", "valid", "num_matches", "num_inliers"):
        np.testing.assert_array_equal(np.asarray(seq[k]), np.asarray(prs[k]),
                                      err_msg=k)


def test_textureless_pair_masks_invalid():
    """Blank images -> no features -> valid=False, identity pose, no crash
    (SURVEY.md §5: per-pair validity mask instead of exceptions)."""
    cfg = EstimatorConfig(
        orb=OrbConfig(nfeatures=500, nlevels=2, max_kpts=512),
        matcher=MatcherConfig(max_matches=128),
        ransac=RansacConfig(num_hypotheses=128),
    )
    img = jnp.zeros((120, 160), jnp.float32)
    K = jnp.asarray(np.diag([100.0, 100.0, 1.0]), jnp.float32)
    out = estimate_pair(img, img, K, jax.random.PRNGKey(0), cfg=cfg)
    assert not bool(out["valid"])
    np.testing.assert_array_equal(np.asarray(out["R"]), np.eye(3, dtype=np.float32))
    assert np.isfinite(np.asarray(out["t"])).all()


def test_zero_motion_pair_returns_identity(pair):
    """Identical images -> zero-motion gate -> exact identity rotation and
    valid=True. The essential matrix is undefined at zero baseline, so
    without the gate the recovered R is backend-noise (the reference
    scores 180 deg on the simulator static-tail pairs — its golden CSV
    rows 810-870; PARITY.md "zero-motion pairs")."""
    img1, _, K = pair
    cfg = EstimatorConfig(
        orb=OrbConfig(nfeatures=1000, nlevels=4, max_kpts=1024),
        matcher=MatcherConfig(max_matches=256),
        ransac=RansacConfig(num_hypotheses=64),
    )
    im = jnp.asarray(img1, jnp.float32)
    out = estimate_pair(im, im, jnp.asarray(K, jnp.float32),
                        jax.random.PRNGKey(3), cfg=cfg)
    assert bool(out["valid"])
    np.testing.assert_array_equal(np.asarray(out["R"]),
                                  np.eye(3, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(out["t"]),
                                  np.array([0, 0, 1], np.float32))


def test_zero_motion_gate_does_not_fire_on_real_motion(pair):
    """The real KITTI pair (15-frame baseline) must NOT trip the static
    gate: median flow is far above 0.5 px, so the estimate is the normal
    essential-decomposition pose (non-identity)."""
    img1, img2, K = pair
    cfg = EstimatorConfig(
        orb=OrbConfig(nfeatures=1000, nlevels=4, max_kpts=1024),
        matcher=MatcherConfig(max_matches=256),
        ransac=RansacConfig(num_hypotheses=64),
    )
    out = estimate_pair(jnp.asarray(img1, jnp.float32),
                        jnp.asarray(img2, jnp.float32),
                        jnp.asarray(K, jnp.float32),
                        jax.random.PRNGKey(3), cfg=cfg)
    assert bool(out["valid"])
    assert not np.allclose(np.asarray(out["R"]), np.eye(3))


@pytest.mark.slow
def test_sift_pair_end_to_end_vs_opencv(pair):
    """feature_method='SIFT' through the fused estimator (detect -> L2
    crossCheck match -> 5pt RANSAC -> recoverPose) on a real pair,
    parity-checked against the cv2.SIFT reference chain
    (src/core/pose_estimator.py:93-94, :115-131). Covers the round-5
    --feature SIFT sequence-runner path at the estimator level (reduced
    shapes: CPU budget)."""
    import dataclasses

    from rpe_tpu.config import SiftConfig

    img1, img2, K = pair
    h, w = img1.shape
    a = cv2.resize(img1, (w // 2, h // 2), interpolation=cv2.INTER_AREA)
    b = cv2.resize(img2, (w // 2, h // 2), interpolation=cv2.INTER_AREA)
    Ks = K.copy()
    Ks[:2] *= 0.5
    Ks[2, 2] = 1.0

    cfg = EstimatorConfig(
        feature_method="SIFT",
        sift=SiftConfig(nfeatures=1024, noctaves=4, max_kpts=1024),
        matcher=MatcherConfig(norm_type="l2", cross_check=True,
                              max_matches=500),
    )
    out = estimate_pair(jnp.asarray(a, jnp.float32),
                        jnp.asarray(b, jnp.float32),
                        jnp.asarray(Ks, jnp.float32),
                        jax.random.PRNGKey(0), cfg=cfg)
    assert bool(out["valid"])

    sift = cv2.SIFT_create(nfeatures=1024)
    kp1, d1 = sift.detectAndCompute(a, None)
    kp2, d2 = sift.detectAndCompute(b, None)
    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
    ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:500]
    p1 = np.float32([kp1[m.queryIdx].pt for m in ms])
    p2 = np.float32([kp2[m.trainIdx].pt for m in ms])
    E, _ = cv2.findEssentialMat(p1, p2, Ks, method=cv2.RANSAC,
                                prob=0.999, threshold=1.0)
    _, R_cv, _, _ = cv2.recoverPose(E, p1, p2, Ks)
    delta = float(rotation_error(out["R"], jnp.asarray(R_cv)))
    assert delta < 2.0, f"SIFT pose delta vs cv2: {delta} deg"
