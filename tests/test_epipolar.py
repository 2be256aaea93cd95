"""Epipolar geometry + RANSAC + pose recovery vs OpenCV oracles on synthetic
scenes (SURVEY.md §4: kernel-level oracle tests; pose-level tolerance is the
parity contract, BASELINE.md north star <= 0.5 deg rotation delta)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from rpe_tpu.geometry import (
    normalize_points,
    eight_point,
    project_to_essential,
    sampson_error_sq,
    ransac_essential,
    recover_pose,
    rotation_error,
    so3_exp,
)

K = np.array([[700.0, 0.0, 320.0], [0.0, 700.0, 240.0], [0.0, 0.0, 1.0]])


def synth_scene(rng, n=200, noise=0.0, outlier_frac=0.0, rot_deg=8.0, n_img=(640, 480)):
    """Random 3D points imaged by two cameras with a known relative pose."""
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * np.deg2rad(rot_deg)
    R = np.asarray(so3_exp(w), dtype=np.float64)
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t)

    X = rng.uniform([-4, -3, 4], [4, 3, 12], size=(n, 3))  # in cam-1 frame
    x1 = X / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2 / X2[:, 2:3]
    p1 = x1 @ K.T
    p2 = x2 @ K.T
    p1 = p1[:, :2] + rng.normal(size=(n, 2)) * noise
    p2 = p2[:, :2] + rng.normal(size=(n, 2)) * noise

    n_out = int(n * outlier_frac)
    if n_out:
        sel = rng.choice(n, size=n_out, replace=False)
        p2[sel] = rng.uniform([0, 0], n_img, size=(n_out, 2))
    return p1.astype(np.float32), p2.astype(np.float32), R, t


def _essential_angle(E_est, E_gt):
    """Angle between essential matrices up to scale/sign (deg)."""
    a = E_est / np.linalg.norm(E_est)
    b = E_gt / np.linalg.norm(E_gt)
    c = min(np.linalg.norm(a - b), np.linalg.norm(a + b))
    return np.rad2deg(2 * np.arcsin(min(1.0, c / 2)))


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def test_eight_point_noiseless(rng):
    p1, p2, R, t = synth_scene(rng, n=100)
    n1 = normalize_points(jnp.asarray(p1), jnp.asarray(K))
    n2 = normalize_points(jnp.asarray(p2), jnp.asarray(K))
    E = eight_point(n1, n2)
    E, _, _ = project_to_essential(E)
    E_gt = skew(t) @ R
    assert _essential_angle(np.asarray(E), E_gt) < 0.5


def test_project_to_essential_singular_values(rng):
    M = rng.normal(size=(5, 3, 3)).astype(np.float32)
    E, U, Vt = project_to_essential(jnp.asarray(M))
    E, U, Vt = np.asarray(E), np.asarray(U), np.asarray(Vt)
    for i in range(5):
        s = np.linalg.svd(E[i], compute_uv=False)
        np.testing.assert_allclose(s / s[0], [1.0, 1.0, 0.0], atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(U[i]), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(Vt[i]), 1.0, atol=1e-4)
        np.testing.assert_allclose(U[i] @ U[i].T, np.eye(3), atol=1e-4)


def test_sampson_zero_on_perfect_points(rng):
    p1, p2, R, t = synth_scene(rng, n=50)
    n1 = normalize_points(jnp.asarray(p1), jnp.asarray(K))
    n2 = normalize_points(jnp.asarray(p2), jnp.asarray(K))
    E_gt = jnp.asarray(skew(t) @ R, dtype=jnp.float32)
    d2 = np.asarray(sampson_error_sq(E_gt, n1, n2))
    assert d2.max() < 1e-8


def test_ransac_with_outliers_vs_opencv():
    # local seed: scene difficulty must not depend on test execution order
    rng = np.random.default_rng(42)
    p1, p2, R_gt, t_gt = synth_scene(rng, n=300, noise=0.3, outlier_frac=0.35)
    n1 = normalize_points(jnp.asarray(p1), jnp.asarray(K))
    n2 = normalize_points(jnp.asarray(p2), jnp.asarray(K))
    valid = jnp.ones(p1.shape[0], dtype=bool)
    thr_n = 1.0 / (0.5 * (K[0, 0] + K[1, 1]))

    out = ransac_essential(jax.random.PRNGKey(0), n1, n2, valid, thr_n,
                           num_hypotheses=1024)
    assert bool(out["ok"])
    R, t, ngood, _ = recover_pose(out["E"], n1, n2, out["inlier_mask"])

    r_err = float(rotation_error(R, jnp.asarray(R_gt)))
    t_err = np.rad2deg(np.arccos(np.clip(abs(np.dot(np.asarray(t), t_gt)), -1, 1)))
    assert r_err < 0.5, f"rotation error {r_err} deg"
    assert t_err < 2.0, f"translation error {t_err} deg"

    # OpenCV on the same data for sanity comparison
    E_cv, _ = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC, prob=0.999, threshold=1.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, p1, p2, K)
    r_err_cv = float(rotation_error(jnp.asarray(R_cv), jnp.asarray(R_gt)))
    # we must be at least in the same accuracy class as OpenCV
    assert r_err < max(0.5, 2.0 * r_err_cv + 0.1)


def test_recover_pose_sign_disambiguation(rng):
    # For each of several scenes, recoverPose must return R close to GT
    # (not a flipped candidate) and t up to sign of the direction.
    for i in range(5):
        p1, p2, R_gt, t_gt = synth_scene(rng, n=120, noise=0.1)
        n1 = normalize_points(jnp.asarray(p1), jnp.asarray(K))
        n2 = normalize_points(jnp.asarray(p2), jnp.asarray(K))
        E_gt = jnp.asarray(skew(t_gt) @ R_gt, dtype=jnp.float32)
        valid = jnp.ones(p1.shape[0], dtype=bool)
        R, t, ngood, good = recover_pose(E_gt, n1, n2, valid)
        assert float(rotation_error(R, jnp.asarray(R_gt))) < 0.2
        # cheirality winner should explain almost all points
        assert int(ngood) > 0.9 * p1.shape[0]
        # t direction matches GT (recoverPose resolves the sign)
        cos = abs(float(jnp.dot(t, jnp.asarray(t_gt, dtype=jnp.float32))))
        assert cos > 0.999


def test_recover_pose_matches_opencv(rng):
    p1, p2, R_gt, t_gt = synth_scene(rng, n=150, noise=0.2)
    E_cv, _ = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC, prob=0.999, threshold=1.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, p1, p2, K)

    n1 = normalize_points(jnp.asarray(p1), jnp.asarray(K))
    n2 = normalize_points(jnp.asarray(p2), jnp.asarray(K))
    valid = jnp.ones(p1.shape[0], dtype=bool)
    R, t, _, _ = recover_pose(jnp.asarray(E_cv, dtype=jnp.float32), n1, n2, valid)
    # Same E -> same recovered pose as OpenCV.
    assert float(rotation_error(R, jnp.asarray(R_cv))) < 0.1
    cos = float(jnp.dot(t, jnp.asarray(t_cv.flatten(), dtype=jnp.float32)))
    assert cos > 0.999


def test_lo_ransac_shrinks_seed_spread():
    """LO-RANSAC (ransac.py `lo=True`: annealed weighted-refit ladder,
    truncated-MSAC acceptance) must (a) tighten the across-seed rotation
    spread on a noisy scene with few hypotheses — the regime where the
    winning minimal sample varies per seed (round-4 verdict #7: salah
    seed variance) — and (b) never hurt mean accuracy. Few hypotheses +
    high noise on purpose: with enough hypotheses both variants converge
    and the test would be vacuous."""
    rng = np.random.default_rng(7)
    p1, p2, R_gt, t_gt = synth_scene(rng, n=200, noise=0.8,
                                     outlier_frac=0.3)
    n1 = normalize_points(jnp.asarray(p1), jnp.asarray(K))
    n2 = normalize_points(jnp.asarray(p2), jnp.asarray(K))
    valid = jnp.ones(p1.shape[0], dtype=bool)
    thr_n = 1.0 / (0.5 * (K[0, 0] + K[1, 1]))

    def errs(lo):
        out = []
        for seed in range(8):
            r = ransac_essential(jax.random.PRNGKey(seed), n1, n2, valid,
                                 thr_n, num_hypotheses=64, lo=lo)
            R, t, _, _ = recover_pose(r["E"], n1, n2, r["inlier_mask"])
            out.append(float(rotation_error(R, jnp.asarray(R_gt))))
        return np.asarray(out)

    base = errs(False)
    lo = errs(True)
    # (a) spread: worst-case across seeds must not grow, and the spread
    # (max-min) must shrink or stay within 10%
    assert lo.max() <= base.max() + 1e-6, (base, lo)
    assert (lo.max() - lo.min()) <= (base.max() - base.min()) * 1.1 + 1e-3
    # (b) accuracy: mean error no worse than base + tiny slack
    assert lo.mean() <= base.mean() + 0.02, (base.mean(), lo.mean())
