"""Homography + plane-degeneracy machinery (geometry/homography.py).

Synthetic-scene validation: the DLT/RANSAC/plane-parallax components must
be exact under clean conditions — the real-data acceptance criterion is a
separate (open, default-off) question, see RansacConfig.degensac.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpe_tpu.geometry import so3_exp
from rpe_tpu.geometry.homography import (
    degensac_rescue,
    dlt_homography,
    homography_transfer_err_sq,
    plane_parallax_essentials,
    ransac_homography,
)
from rpe_tpu.geometry.recover_pose import recover_pose
from rpe_tpu.geometry.rotations import rotation_error_np


def _plane_scene(rng, n_plane=120, n_off=40, n_out=20, noise=0.0):
    """Camera pair viewing a dominant plane plus off-plane structure.

    Returns (x1, x2, valid, R_gt, t_gt, H_gt, off_mask) in normalized
    camera coordinates.
    """
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * np.deg2rad(6.0)
    R = np.asarray(so3_exp(w), np.float64)
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t) * 0.4

    # plane z = 6 + 0.2 x - 0.1 y in camera-1 frame: n.X = d
    n = np.array([-0.2, 0.1, 1.0])
    n /= np.linalg.norm(n)
    d = 6.0 * n[2]
    xy = rng.uniform(-1.5, 1.5, size=(n_plane, 2))
    z = (d - n[0] * xy[:, 0] * 6.0 - n[1] * xy[:, 1] * 6.0) / n[2]
    Xp = np.stack([xy[:, 0] * 6.0, xy[:, 1] * 6.0, z], axis=1)
    Xo = rng.uniform([-6, -6, 2.5], [6, 6, 4.5], size=(n_off, 3))
    X = np.concatenate([Xp, Xo])

    x1 = (X / X[:, 2:3])[:, :2]
    X2 = X @ R.T + t
    x2 = (X2 / X2[:, 2:3])[:, :2]
    if noise:
        x1 = x1 + rng.normal(scale=noise, size=x1.shape)
        x2 = x2 + rng.normal(scale=noise, size=x2.shape)
    # outright mismatches
    xo1 = rng.uniform(-0.8, 0.8, size=(n_out, 2))
    xo2 = rng.uniform(-0.8, 0.8, size=(n_out, 2))
    x1 = np.concatenate([x1, xo1])
    x2 = np.concatenate([x2, xo2])
    valid = np.ones(len(x1), bool)

    H_gt = R + np.outer(t, n) / d    # plane-induced homography (x2 ~ H x1)
    off = np.zeros(len(x1), bool)
    off[n_plane:n_plane + n_off] = True
    return (x1.astype(np.float32), x2.astype(np.float32), valid,
            R, t, H_gt, off)


def test_dlt_homography_exact():
    rng = np.random.default_rng(0)
    x1, x2, valid, R, t, H_gt, off = _plane_scene(rng, n_off=0, n_out=0)
    H = np.asarray(dlt_homography(jnp.asarray(x1), jnp.asarray(x2)),
                   np.float64)
    H = H / H[2, 2] * np.sign(H_gt[2, 2])
    H_gt = H_gt / H_gt[2, 2]
    assert np.allclose(H, H_gt, atol=5e-4), f"\n{H}\nvs\n{H_gt}"
    err = np.asarray(homography_transfer_err_sq(
        jnp.asarray(H.astype(np.float32)), jnp.asarray(x1),
        jnp.asarray(x2)))
    assert float(np.max(err)) < 1e-6


def test_ransac_homography_rejects_outliers():
    rng = np.random.default_rng(1)
    x1, x2, valid, R, t, H_gt, off = _plane_scene(rng, n_off=0, n_out=40,
                                                  noise=2e-4)
    H, mask, cnt = ransac_homography(
        jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2),
        jnp.asarray(valid), 2e-3, num_hypotheses=64)
    mask = np.asarray(mask)
    assert int(cnt) >= 110                       # plane points recovered
    assert not mask[-40:].any()                  # mismatches excluded


def test_plane_parallax_recovers_pose():
    """From the TRUE plane homography + clean off-plane pairs, the
    plane-and-parallax candidates contain an essentially exact pose."""
    rng = np.random.default_rng(2)
    x1, x2, valid, R_gt, t_gt, H_gt, off = _plane_scene(rng, n_out=0)
    E, ok = plane_parallax_essentials(
        jax.random.PRNGKey(0), jnp.asarray(H_gt.astype(np.float32)),
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(off),
        num_hypotheses=32)
    best = 180.0
    with jax.default_matmul_precision("highest"):
        for i in range(32):
            if not bool(ok[i]):
                continue
            R, t, _, _ = recover_pose(E[i], jnp.asarray(x1),
                                      jnp.asarray(x2), jnp.asarray(valid))
            best = min(best, float(rotation_error_np(
                np.asarray(R, np.float64), R_gt)))
    assert best < 0.2, f"best plane-parallax rotation error {best:.3f} deg"


def test_degensac_rescue_replaces_planar_winner():
    """A deliberately wrong essential matrix whose support is the plane
    gets rescued to the true pose on a clean plane-dominant scene."""
    rng = np.random.default_rng(3)
    x1, x2, valid, R_gt, t_gt, H_gt, off = _plane_scene(rng, noise=1e-4)
    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)
    thr = 2e-3

    # wrong model FROM THE DEGENERATE FAMILY: F = [e]x H with a wrong
    # epipole explains every plane point exactly (that is the failure
    # mode RANSAC count-selection cannot see) but misses off-plane ones
    from rpe_tpu.geometry.epipolar import project_to_essential

    e_wrong = np.array([0.4, -0.3, 1.0])
    e_wrong /= np.linalg.norm(e_wrong)
    ex = np.array([[0, -e_wrong[2], e_wrong[1]],
                   [e_wrong[2], 0, -e_wrong[0]],
                   [-e_wrong[1], e_wrong[0], 0]])
    E_bad, _, _ = project_to_essential(
        jnp.asarray((ex @ H_gt).astype(np.float32)))

    from rpe_tpu.geometry.epipolar import sampson_error_sq

    with jax.default_matmul_precision("highest"):
        d2 = sampson_error_sq(E_bad, x1j, x2j)
        inl = (d2 < thr * thr) & jnp.asarray(valid)
        E_out, mask_out, n_out_, used, h_cnt = degensac_rescue(
            jax.random.PRNGKey(0), E_bad, inl, jnp.sum(inl.astype(jnp.int32)),
            x1j, x2j, jnp.asarray(valid), thr)
        R_fin, _, _, _ = recover_pose(E_out, x1j, x2j, jnp.asarray(valid),
                                      inlier_mask=mask_out)
    err = float(rotation_error_np(np.asarray(R_fin, np.float64), R_gt))
    assert bool(used), "rescue did not engage on a plane-dominant scene"
    assert err < 1.0, f"rescued rotation error {err:.3f} deg"
