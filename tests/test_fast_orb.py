"""FAST/ORB detection vs OpenCV oracles on a real dataset image
(SURVEY.md §4: kernel-level oracle tests with tolerance; pose-level parity
is asserted end-to-end in test_estimator.py)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from rpe_tpu.ops.fast import fast_score_map, nonmax_suppress_3x3, harris_response_map
from rpe_tpu.ops.orb import orb_detect_and_describe, ic_angles, gather_patches
from rpe_tpu.ops.pyramid import build_pyramid, level_shapes, gaussian_blur

IMG_PATH = "/root/reference/evaluation-runs/single-pair/images/000000.png"


@pytest.fixture(scope="module")
def gray():
    img = cv2.imread(IMG_PATH, cv2.IMREAD_GRAYSCALE)
    assert img is not None
    return img


def test_fast_corners_agree_with_opencv(gray):
    t = 15
    ours = np.asarray(fast_score_map(jnp.asarray(gray, jnp.float32), float(t)))
    ours_mask = ours > 0

    det = cv2.FastFeatureDetector_create(
        threshold=t, nonmaxSuppression=False,
        type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
    )
    kps = det.detect(gray, None)
    cv_mask = np.zeros_like(ours_mask)
    for kp in kps:
        x, y = int(round(kp.pt[0])), int(round(kp.pt[1]))
        cv_mask[y, x] = True

    # compare away from borders (we mask borders separately)
    m = 5
    a = ours_mask[m:-m, m:-m]
    b = cv_mask[m:-m, m:-m]
    inter = (a & b).sum()
    union = (a | b).sum()
    assert union > 100
    iou = inter / union
    # float-vs-uint8 comparisons flip a few marginal pixels; demand high IoU
    assert iou > 0.95, f"FAST corner IoU vs OpenCV: {iou:.3f}"


def test_nonmax_is_local_max(gray):
    s = fast_score_map(jnp.asarray(gray, jnp.float32), 15.0)
    nm = np.asarray(nonmax_suppress_3x3(s))
    ys, xs = np.nonzero(nm)
    sn = np.asarray(s)
    for y, x in list(zip(ys, xs))[:200]:
        if 1 <= y < nm.shape[0] - 1 and 1 <= x < nm.shape[1] - 1:
            assert sn[y, x] >= sn[y - 1:y + 2, x - 1:x + 2].max()


def test_harris_ranking_correlates_with_opencv(gray):
    ours = np.asarray(harris_response_map(jnp.asarray(gray, jnp.float32)))
    cv_h = cv2.cornerHarris(gray.astype(np.float32), 7, 1, 0.04)
    # compare rank correlation on strong-corner pixels
    m = 10
    o = ours[m:-m, m:-m].ravel()
    c = cv_h[m:-m, m:-m].ravel()
    sel = np.argsort(-c)[:2000]
    from scipy.stats import spearmanr
    rho, _ = spearmanr(o[sel], c[sel])
    assert rho > 0.8, f"Harris rank correlation {rho:.3f}"


def test_pyramid_shapes_match_opencv_rounding():
    shapes = level_shapes(480, 640, nlevels=12, scale_factor=1.1)
    assert shapes[0] == (480, 640)
    for l, (h, w) in enumerate(shapes):
        assert h == round(480 / 1.1 ** l)
        assert w == round(640 / 1.1 ** l)


def test_gaussian_blur_matches_opencv(gray):
    ours = np.asarray(gaussian_blur(jnp.asarray(gray, jnp.float32)))
    ref = cv2.GaussianBlur(gray.astype(np.float32), (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(ours, ref, atol=0.05)


def test_ic_angle_matches_opencv_orientation(gray):
    # OpenCV ORB orientation on a few detected keypoints vs our IC angle on
    # the same patches.
    orb = cv2.ORB_create(nfeatures=200, scaleFactor=1.1, nlevels=1, fastThreshold=15)
    kps = orb.detect(gray, None)
    kps = [kp for kp in kps if 20 < kp.pt[0] < gray.shape[1] - 20
           and 20 < kp.pt[1] < gray.shape[0] - 20][:50]
    assert len(kps) >= 20
    xy = jnp.asarray(np.array([[round(kp.pt[0]), round(kp.pt[1])] for kp in kps],
                              dtype=np.float32))
    patches = gather_patches(jnp.asarray(gray, jnp.float32), xy)
    ours_deg = np.rad2deg(np.asarray(ic_angles(patches))) % 360.0
    cv_deg = np.array([kp.angle for kp in kps])
    diff = np.abs(((ours_deg - cv_deg + 180) % 360) - 180)
    # subpixel keypoint positions + float-vs-int sums leave small deltas
    assert np.median(diff) < 2.0, f"median angle delta {np.median(diff):.2f} deg"


def test_orb_detect_and_describe_shapes_and_sanity(gray):
    out = orb_detect_and_describe(jnp.asarray(gray, jnp.float32), nfeatures=1000,
                                  nlevels=4, max_kpts=1024)
    assert out["xy"].shape == (1024, 2)
    assert out["bits"].shape == (1024, 256)
    n_valid = int(np.asarray(out["valid"]).sum())
    assert n_valid > 300
    xy = np.asarray(out["xy"])[np.asarray(out["valid"])]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < gray.shape[1]).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < gray.shape[0]).all()
    # descriptor bits should be roughly balanced (not constant)
    bits = np.asarray(out["bits"])[np.asarray(out["valid"])]
    frac = bits.mean()
    assert 0.3 < frac < 0.7


def test_detection_topk_recall_vs_exact(gray):
    """Per-level quota selection uses jax.lax.approx_max_k (ops/orb.py,
    ops/fast.py) — rank-sensitive, unlike match truncation. Measure its
    recall against exact lax.top_k on the real image's Harris rank map in
    both regimes: quota << corners and quota > corners."""
    import jax
    from rpe_tpu.ops.fast import border_mask

    img = jnp.asarray(gray, jnp.float32)
    score = nonmax_suppress_3x3(fast_score_map(img, 15.0))
    harris = harris_response_map(img)
    rank2d = jnp.where(score > 0.0, harris, -jnp.inf)
    h, w = gray.shape
    rank = jnp.where(border_mask(h, w, 31), rank2d, -jnp.inf).reshape(-1)
    n_corners = int(jnp.sum(rank > -jnp.inf))
    assert n_corners > 1000  # the real frame must be corner-rich

    for quota in (512, int(1.5 * n_corners)):
        av, ai = jax.lax.approx_max_k(rank, quota)
        ev, ei = jax.lax.top_k(rank, quota)
        exact = set(np.asarray(ei)[np.asarray(ev) > -np.inf].tolist())
        got = set(np.asarray(ai)[np.asarray(av) > -np.inf].tolist())
        recall = len(got & exact) / max(len(exact), 1)
        assert recall >= 0.90, f"quota={quota}: approx top-k recall {recall}"
        # everything approx selects must be a real corner
        assert got <= set(np.asarray(jnp.nonzero(rank > -jnp.inf)[0]).tolist())


def test_cv2_brief_interop(gray):
    """RPE_BRIEF=cv2 descriptor interop (closes the descriptor-interop gap:
    reference src/core/pose_estimator.py:84-91 descriptors are cv2's):
    with OpenCV's learned pattern (ops/brief_cv2_pattern.py, recovered from
    the cv2 oracle) our descriptors cross-match against cv2-produced ones.
    cv2-interop mode quantizes sampled values to integers before the bit
    compare (cv2 samples a uint8 blurred image; measured bit agreement
    0.950 -> 0.983). Residual bit noise: blur differences crossing the
    rounding boundary, rim points past the 31x31 patch clamp, and a small
    tail of ambiguous angles."""
    import os
    from unittest import mock

    from scipy.spatial import cKDTree

    with mock.patch.dict(os.environ, {"RPE_BRIEF": "cv2"}):
        ours = orb_detect_and_describe(
            jnp.asarray(gray.astype(np.float32)), nfeatures=800,
            nlevels=1, max_kpts=1024)
    v = np.asarray(ours["valid"])
    oxy = np.asarray(ours["xy"])[v]
    oang = np.asarray(ours["angle"])[v]
    od = np.packbits(np.asarray(ours["bits"])[v], axis=1, bitorder="little")

    orb = cv2.ORB_create(nfeatures=800, nlevels=1, fastThreshold=15,
                         scoreType=cv2.ORB_HARRIS_SCORE)
    kps, desc = orb.detectAndCompute(gray.astype(np.uint8), None)
    cxy = np.array([kp.pt for kp in kps])
    cang = np.array([kp.angle for kp in kps])

    d, idx = cKDTree(cxy).query(oxy, k=1)
    m = d < 0.5
    assert m.sum() > 250
    # IC angles: exact cv2 umax table -> sub-0.1 deg for >= 90% of kpts
    da = np.abs(np.angle(np.exp(1j * (oang[m] - np.deg2rad(cang[idx[m]])))))
    assert np.degrees(np.percentile(da, 90)) < 0.1
    # descriptor bits: high agreement on co-located keypoints
    ham = np.array([
        bin(int.from_bytes(bytes(od[i]), "big")
            ^ int.from_bytes(bytes(desc[idx[i]]), "big")).count("1")
        for i in np.nonzero(m)[0]])
    assert (1 - ham / 256).mean() > 0.96
    # the real interop contract: cv2's own BFMatcher cross-matches our
    # descriptors against cv2's, geometrically consistently
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    ms = bf.match(od, desc)
    good = sum(1 for mm in ms
               if np.hypot(*(oxy[mm.queryIdx] - cxy[mm.trainIdx])) < 2.0)
    assert len(ms) > 300
    assert good / len(ms) > 0.85
