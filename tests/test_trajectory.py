"""Trajectory accumulation + ATE/RPE (pipeline/trajectory.py).

The reference has no trajectory surface (pose_evaluator.py scores per-pair
errors only); these tests validate the added mono-VO evaluation math on
synthetic trajectories with known ground truth.
"""

import numpy as np
import pytest

from rpe_tpu.pipeline.trajectory import (
    accumulate_trajectory,
    ate,
    gt_scales,
    load_kitti_poses,
    rpe,
    save_kitti_poses,
    umeyama,
)


def _rot(axis, deg):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.radians(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def _synthetic_relposes(n=40, seed=3):
    rng = np.random.default_rng(seed)
    Rs = np.stack([_rot(rng.normal(size=3), rng.uniform(-4, 4))
                   for _ in range(n)])
    ts = rng.normal(size=(n, 3))
    ts /= np.linalg.norm(ts, axis=-1, keepdims=True)
    scales = rng.uniform(0.5, 2.0, size=n)
    return Rs, ts, scales


def test_accumulate_round_trip_exact():
    """Chaining relative poses then re-deriving them is identity."""
    Rs, ts, scales = _synthetic_relposes()
    traj = accumulate_trajectory(Rs, ts, scales=scales)
    assert traj.shape == (len(Rs) + 1, 4, 4)
    # Re-derive each relative pose: T_c2_c1 = inv(T_w_c2) @ T_w_c1
    for i in range(len(Rs)):
        rel = np.linalg.inv(traj[i + 1]) @ traj[i]
        np.testing.assert_allclose(rel[:3, :3], Rs[i], atol=1e-10)
        np.testing.assert_allclose(rel[:3, 3], scales[i] * ts[i], atol=1e-10)
    # Orthonormality survives the chain
    RtR = traj[-1, :3, :3].T @ traj[-1, :3, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-12)


def test_invalid_pairs_contribute_identity():
    Rs, ts, scales = _synthetic_relposes(10)
    valid = np.ones(10, bool)
    valid[4] = False
    traj = accumulate_trajectory(Rs, ts, scales=scales, valid=valid)
    assert np.isfinite(traj).all()
    np.testing.assert_allclose(traj[5], traj[4], atol=0)


def test_ate_zero_on_exact_and_known_on_perturbed():
    Rs, ts, scales = _synthetic_relposes()
    gt = accumulate_trajectory(Rs, ts, scales=scales)
    res = ate(gt, gt, align="none")
    assert res["rmse"] < 1e-12
    # Perturb one position by a known offset with alignment off
    est = gt.copy()
    est[7, :3, 3] += np.array([0.3, 0.0, 0.4])
    res = ate(est, gt, align="none")
    assert res["max"] == pytest.approx(0.5, abs=1e-12)
    assert res["rmse"] == pytest.approx(0.5 / np.sqrt(len(gt)), rel=1e-9)


def test_ate_sim3_alignment_invariance():
    """ATE after sim3 alignment is invariant to any sim3 warp of the
    estimate — the monocular gauge freedom."""
    Rs, ts, scales = _synthetic_relposes()
    gt = accumulate_trajectory(Rs, ts, scales=scales)
    W = np.eye(4)
    W[:3, :3] = 2.7 * _rot([1, 2, -1], 33.0)
    W[:3, 3] = [5.0, -3.0, 1.5]
    est = W @ gt
    res = ate(est, gt, align="sim3")
    assert res["rmse"] < 1e-9
    # se3 alignment cannot absorb the 2.7x scale
    res_se3 = ate(est, gt, align="se3")
    assert res_se3["rmse"] > 0.1


def test_umeyama_recovers_known_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    R_true = _rot([0.2, 1.0, -0.5], 70.0)
    s_true, t_true = 1.7, np.array([0.4, -2.0, 3.0])
    dst = (s_true * (R_true @ src.T)).T + t_true
    s, R, t = umeyama(src, dst)
    assert s == pytest.approx(s_true, rel=1e-12)
    np.testing.assert_allclose(R, R_true, atol=1e-12)
    np.testing.assert_allclose(t, t_true, atol=1e-12)


def test_rpe_exact_and_known_rotation_offset():
    Rs, ts, scales = _synthetic_relposes(20)
    gt = accumulate_trajectory(Rs, ts, scales=scales)
    res = rpe(gt, gt, delta=1)
    assert res["trans"]["rmse"] < 1e-12
    # arccos near trace=3 has a ~1e-6 deg fp floor; anything below 1e-4 deg
    # is "exact" for this metric.
    assert res["rot_deg"]["rmse"] < 1e-4
    # Replace one relative rotation with a 5-degree-off version: exactly one
    # delta-1 relative step differs, by exactly 5 degrees.
    Rs2 = Rs.copy()
    Rs2[6] = Rs[6] @ _rot([0, 0, 1], 5.0)
    est = accumulate_trajectory(Rs2, ts, scales=scales)
    res = rpe(est, gt, delta=1)
    assert res["rot_deg"]["max"] == pytest.approx(5.0, abs=1e-8)
    # the same ~1e-6 deg arccos floor applies per-step: count steps above the
    # "exact" 1e-4 threshold, not above the fp noise floor itself
    assert np.sum(res["rot_errors_deg"] > 1e-4) == 1


def test_rpe_delta_gt_one():
    Rs, ts, scales = _synthetic_relposes(15)
    gt = accumulate_trajectory(Rs, ts, scales=scales)
    res = rpe(gt, gt, delta=5)
    assert len(res["trans_errors"]) == len(gt) - 5
    assert res["trans"]["rmse"] < 1e-12


def test_gt_scales_and_mono_scale_resolution():
    """Unit-direction estimates + gt_scales reproduce the metric chain."""
    Rs, ts, scales = _synthetic_relposes()
    gt = accumulate_trajectory(Rs, ts, scales=scales)
    np.testing.assert_allclose(gt_scales(gt), scales, atol=1e-10)
    est = accumulate_trajectory(Rs, ts, scales=gt_scales(gt))
    assert ate(est, gt, align="none")["rmse"] < 1e-10


def test_kitti_pose_io_round_trip(tmp_path):
    Rs, ts, scales = _synthetic_relposes(8)
    poses = accumulate_trajectory(Rs, ts, scales=scales)
    p = tmp_path / "poses.txt"
    save_kitti_poses(p, poses)
    loaded = load_kitti_poses(p)
    assert loaded.shape == poses.shape
    np.testing.assert_allclose(loaded, poses, atol=1e-7)
    # 12 columns per line, KITTI format
    first = p.read_text().splitlines()[0].split()
    assert len(first) == 12
