"""SIFT detection/description vs OpenCV oracle + end-to-end pose parity
(BASELINE.json config #2: SIFT DoG pyramid + L2 matching)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from rpe_tpu.config import SiftConfig
from rpe_tpu.ops.sift import sift_detect_and_describe
from rpe_tpu.pipeline.estimator import PoseEstimator
from rpe_tpu.geometry import rotation_error

P1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
P2 = "/root/reference/evaluation-runs/single-pair/images/000015.png"


@pytest.fixture(scope="module")
def pair():
    img1 = cv2.imread(P1, cv2.IMREAD_GRAYSCALE)
    img2 = cv2.imread(P2, cv2.IMREAD_GRAYSCALE)
    h, w = img1.shape
    K = np.array([
        [924.82939686 * w / 960, 0, 468.24930789 * w / 960],
        [0, 920.4766382 * h / 720, 353.65863024 * h / 720],
        [0, 0, 1.0]])
    return img1, img2, K


def test_sift_keypoints_agree_with_opencv(pair):
    img1, _, _ = pair
    out = sift_detect_and_describe(jnp.asarray(img1, jnp.float32),
                                   SiftConfig(max_kpts=2048))
    v = np.asarray(out["valid"])
    xy = np.asarray(out["xy"])[v]
    assert v.sum() > 100

    kps = cv2.SIFT_create().detect(img1, None)
    cvxy = np.array([k.pt for k in kps])
    from scipy.spatial import cKDTree

    d, _ = cKDTree(xy).query(cvxy, k=1)
    frac2 = (d < 2.0).mean()
    # Achieved level is 1.0 (every cv2 keypoint reproduced within 2 px,
    # measured on this frame); gate at 0.95 so a regression from the
    # claimed 100% parity (PARITY.md) cannot pass silently.
    assert frac2 > 0.95, f"only {frac2:.2f} of OpenCV SIFT kps reproduced"


def test_sift_descriptor_similarity_vs_opencv(pair):
    """Descriptor-similarity oracle: mean cosine between our descriptor and
    cv2's at the same keypoint. Pairing is by position AND angle: cv2 emits
    one keypoint per orientation peak at the same (x, y), so xy-nearest
    alone pairs descriptors computed at different orientations (that
    artifact capped the round-3 measurement at 0.896). For each cv2
    keypoint, take our keypoints within 1 px and pick the closest angle;
    keypoints whose angles agree within 5 deg (the vast majority) must
    match at mean cosine > 0.97 — measured 0.990 after the round-3
    descriptor-Gaussian-width fix (cv2 weighting in histogram units is
    exp(-(c^2+r^2)/(0.5 d^2)); the previous window was ~2.6x too narrow).
    The histograms are built with vectorized fixed-grid binning, so bit
    parity is not expected; the gate guards against structural regressions
    (wrong orientation frame / window geometry / trilinear binning)."""
    img1, _, _ = pair
    out = sift_detect_and_describe(jnp.asarray(img1, jnp.float32),
                                   SiftConfig(max_kpts=2048))
    v = np.asarray(out["valid"])
    xy = np.asarray(out["xy"])[v]
    desc = np.asarray(out["desc"])[v]
    oura = np.degrees(np.asarray(out["angle"])[v]) % 360.0

    kps, cvdesc = cv2.SIFT_create().detectAndCompute(img1, None)
    cvxy = np.array([k.pt for k in kps])
    cvang = np.array([k.angle for k in kps])
    from scipy.spatial import cKDTree

    d, idx = cKDTree(xy).query(cvxy, k=6)
    inr = d < 1.0
    da = np.abs((oura[idx] - cvang[:, None] + 180.0) % 360.0 - 180.0)
    da = np.where(inr, da, np.inf)
    best = np.argmin(da, axis=1)
    rows = np.arange(len(cvxy))
    m = inr[rows, best]
    sel = idx[rows, best][m]
    da_best = da[rows, best][m]

    # our angles reproduce cv2's directly (same degree convention):
    # measured 93% of paired keypoints within 5 deg on this frame after
    # the orientation-window Gaussian fix (cv2 sigma = 1.5*scl)
    assert (da_best < 5.0).mean() > 0.85, \
        f"angle parity {(da_best < 5.0).mean():.2f}"

    ours = desc[sel]
    theirs = cvdesc[m].astype(np.float64)
    theirs /= np.linalg.norm(theirs, axis=1, keepdims=True) + 1e-12
    cos = np.sum(ours * theirs, axis=1)
    good = da_best < 5.0
    assert good.sum() > 100
    assert cos[good].mean() > 0.97, \
        f"mean descriptor cosine {cos[good].mean():.3f}"


def test_sift_descriptor_normalization(pair):
    img1, _, _ = pair
    out = sift_detect_and_describe(jnp.asarray(img1, jnp.float32),
                                   SiftConfig(max_kpts=1024))
    v = np.asarray(out["valid"])
    desc = np.asarray(out["desc"])[v]
    norms = np.linalg.norm(desc, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert (desc >= 0).all()
    assert desc.max() <= 0.2 / 0.19  # clipped at 0.2 then renormalized


def test_sift_pose_parity_vs_opencv(pair):
    img1, img2, K = pair
    sift = cv2.SIFT_create()
    kp1, d1 = sift.detectAndCompute(img1, None)
    kp2, d2 = sift.detectAndCompute(img2, None)
    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
    ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:500]
    p1 = np.float32([kp1[m.queryIdx].pt for m in ms])
    p2 = np.float32([kp2[m.trainIdx].pt for m in ms])
    E, _ = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC,
                                prob=0.999, threshold=1.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E, p1, p2, K)

    est = PoseEstimator(K, feature_method="SIFT", norm_type="L2")
    dbg = est.estimate_with_debug(img1, img2)
    assert dbg["num_matches"] >= 50
    delta = float(rotation_error(jnp.asarray(dbg["R"]), jnp.asarray(R_cv)))
    # Cross-implementation AGREEMENT gate, not an accuracy gate: with ~110
    # matches both estimates carry ~1 deg of RANSAC/match-set noise.
    # Measured 1.17 deg after the round-3 orientation/descriptor-window
    # fixes (was 0.57 with the old, less cv2-faithful descriptors) — and
    # GT adjudication on simulator pairs with known-identity rotation says
    # ours is the MORE accurate side (ours 0.99/0.72 deg vs cv2's
    # 1.40/0.89 on pairs (0,15)/(300,315)), so the delta is dominated by
    # cv2's own error. Gate = measured + margin.
    assert delta < 1.5, f"SIFT pose delta vs OpenCV: {delta:.3f} deg"
