"""Count-tie ambiguity blend (geometry/ambiguity.py) + degensac default.

Fixtures in tests/data/sim_matches_*.npz are this framework's own
detect+match outputs (deterministic; regenerate with
.scratch/degensac_lab.py) on real simulator pairs, with the GT relative
rotation from camera_poses.txt:

  150->165  the quasi-degenerate transition pair (mixed 3-deg rotation +
            translation; flat likelihood valley). The reference's
            cv2.findEssentialMat scores 5.77 deg on it (reference
            src/core/pose_estimator.py:522-527, golden CSV row).
  300->315  clean pure-translation pair (blend must not move it).
  690->705  mildly ambiguous pure-translation pair.
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpe_tpu.geometry.ambiguity import _polar_rotation, ambiguity_blend
from rpe_tpu.geometry.epipolar import normalize_points
from rpe_tpu.geometry.ransac import ransac_essential
from rpe_tpu.geometry.recover_pose import recover_pose
from rpe_tpu.geometry.rotations import rotation_error_np, so3_exp

DATA = Path(__file__).parent / "data"


def _load(f1, f2):
    z = np.load(DATA / f"sim_matches_{f1}_{f2}.npz")
    return (z["pts1"], z["pts2"], z["mvalid"], z["K"],
            z["R_gt"].astype(np.float64))


def _run(pts1, pts2, mv, K, seed, degensac):
    n1 = normalize_points(jnp.asarray(pts1), jnp.asarray(K))
    n2 = normalize_points(jnp.asarray(pts2), jnp.asarray(K))
    thr = 1.0 / (0.5 * (K[0, 0] + K[1, 1]))
    with jax.default_matmul_precision("highest"):
        r = ransac_essential(jax.random.PRNGKey(seed), n1, n2,
                             jnp.asarray(mv), thr, num_hypotheses=256,
                             solver="5pt", degensac=degensac)
        R, t, _, _ = recover_pose(r["E"], n1, n2, jnp.asarray(mv),
                                  inlier_mask=r["inlier_mask"])
    return np.asarray(R, np.float64), np.asarray(r["E"]), bool(r["ok"])


def test_polar_rotation_projects_blend():
    rng = np.random.default_rng(0)
    Rs = []
    for _ in range(4):
        w = rng.normal(size=3)
        Rs.append(np.asarray(so3_exp(w / np.linalg.norm(w)
                                     * np.deg2rad(3.0)), np.float64))
    M = np.mean(Rs, axis=0)
    R = np.asarray(_polar_rotation(jnp.asarray(M)), np.float64)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.9
    # polar factor of a rotation is itself
    R0 = np.asarray(_polar_rotation(jnp.asarray(Rs[0])), np.float64)
    assert np.allclose(R0, Rs[0], atol=1e-6)


@pytest.mark.slow
def test_ambiguous_pair_bounded_across_seeds():
    """VERDICT round-3 acceptance bar: sim 150->165 must score <= the
    reference's 5.77 deg on EVERY seed with degensac on (plain selection
    draws 0.35-8.0 across seeds on this pair)."""
    pts1, pts2, mv, K, R_gt = _load(150, 165)
    errs = []
    for seed in range(5):
        R, _, ok = _run(pts1, pts2, mv, K, seed, degensac=True)
        assert ok
        errs.append(float(rotation_error_np(R, R_gt)))
    assert max(errs) <= 5.77, errs


@pytest.mark.slow
def test_clean_pair_unchanged_by_degensac():
    pts1, pts2, mv, K, R_gt = _load(300, 315)
    for seed in range(2):
        R_on, E_on, ok_on = _run(pts1, pts2, mv, K, seed, degensac=True)
        R_off, E_off, ok_off = _run(pts1, pts2, mv, K, seed, degensac=False)
        assert ok_on and ok_off
        # neither mechanism should fire: identical winner
        np.testing.assert_allclose(E_on, E_off, atol=1e-7)
        err = float(rotation_error_np(R_on, R_gt))
        assert err < 1.5, err


@pytest.mark.slow
def test_mildly_ambiguous_pair_not_degraded():
    pts1, pts2, mv, K, R_gt = _load(690, 705)
    for seed in range(3):
        R_on, _, ok = _run(pts1, pts2, mv, K, seed, degensac=True)
        assert ok
        err = float(rotation_error_np(R_on, R_gt))
        assert err < 4.6, err  # plain selection's worst seed was 4.51


def test_blend_noop_below_diameter():
    """Synthetic direct call: candidates all within the diameter gate ->
    fired=False and the winner passes through bit-identical."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=3)
    R_gt = np.asarray(so3_exp(w / np.linalg.norm(w) * np.deg2rad(8.0)))
    t_gt = rng.normal(size=3)
    t_gt /= np.linalg.norm(t_gt)
    N = 200
    X = rng.uniform([-2, -2, 3], [2, 2, 12], size=(N, 3))
    x1 = (X / X[:, 2:3])[:, :2]
    X2 = X @ R_gt.T + t_gt
    x2 = (X2 / X2[:, 2:3])[:, :2]
    valid = jnp.ones(N, bool)
    tx = np.array([[0, -t_gt[2], t_gt[1]], [t_gt[2], 0, -t_gt[0]],
                   [-t_gt[1], t_gt[0], 0]])
    E = jnp.asarray((tx @ R_gt).astype(np.float32))
    E_h = jnp.stack([E] * 8)
    from rpe_tpu.geometry.epipolar import sampson_error_sq

    with jax.default_matmul_precision("highest"):
        d2 = sampson_error_sq(E_h, jnp.asarray(x1, jnp.float32)[None],
                              jnp.asarray(x2, jnp.float32)[None])
        inl = (d2 < 1e-6) & valid[None]
        counts = jnp.sum(inl.astype(jnp.int32), axis=1)
        E_out, mask_out, n_out, fired = ambiguity_blend(
            E_h, counts, counts, inl,
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            valid, 1e-3, E, inl[0], counts[0])
    assert not bool(fired)  # duplicates dedupe to one candidate
    np.testing.assert_array_equal(np.asarray(E_out), np.asarray(E))
