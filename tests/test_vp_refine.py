"""VP (Manhattan) refinement vs the reference implementation as oracle
(reference pose_estimator.py:159-481 imported standalone in-test)."""

import importlib.util

import cv2
import numpy as np
import pytest

from rpe_tpu.config import VpConfig
from rpe_tpu.geometry.vp_refine import (
    _so3_exp_np,
    estimate_manhattan_dirs,
    optimize_rotation_from_vps,
    refine_rotation_with_vps,
    vp_cost,
)

PHONE_IMG = "/root/reference/evaluation-runs/phone-data/data/images/000000.png"
PHONE_CAL = "/root/reference/evaluation-runs/phone-data/data/calibration_scaled.npz"


@pytest.fixture(scope="module")
def ref_pe():
    spec = importlib.util.spec_from_file_location(
        "ref_pe", "/root/reference/src/core/pose_estimator.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def phone():
    gray = cv2.imread(PHONE_IMG, cv2.IMREAD_GRAYSCALE)
    K = np.load(PHONE_CAL)["K"]
    return gray, K


def test_vp_cost_matches_reference(ref_pe, rng):
    for _ in range(10):
        A = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        B = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        ours = vp_cost(R, A, B)
        theirs = ref_pe.PoseEstimator._vp_cost(R, A, B)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_lm_optimizer_matches_reference_exactly(ref_pe, phone):
    """Compat mode (jacobian_sign=-1) vs the reference LM.

    Deterministic local rng — NOT the shared session fixture: with the
    shared rng this test's inputs depended on which other tests ran
    before it, and ~1% of input space lands on an LM accept/reject
    boundary where fp-order differences flip a branch and the two
    otherwise-identical iterations drift apart (measured worst case over
    4000 fuzzed problems: 0.031 deg geodesic, with the compat result at
    LOWER reference cost — same basin, different step acceptance). Gate:
    bit-for-bit (1e-8) on at least 80% of problems, and on any drifted
    problem <= 0.05 deg with reference cost no worse than the
    reference's own result.
    """
    _, K = phone
    est = ref_pe.PoseEstimator(K)
    cfg = VpConfig()
    rng = np.random.default_rng(2024)
    n_exact = 0
    n_trials = 10
    for i in range(n_trials):
        A = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(A) < 0:
            A[:, 2] *= -1
        D_world = A
        Delta_cam = _so3_exp_np(rng.normal(size=3) * 0.05) @ D_world
        R0 = _so3_exp_np(rng.normal(size=3) * 0.02)
        # jacobian_sign=-1 reproduces the reference bit-for-bit (including
        # its sign bug, which makes its LM ascend the cost; see
        # optimize_rotation_from_vps docstring)
        R_compat = np.asarray(optimize_rotation_from_vps(
            R0, Delta_cam, D_world, cfg, jacobian_sign=-1.0))
        R_ref = est._optimize_rotation_from_vps(R0, Delta_cam, D_world)
        if np.abs(R_compat - R_ref).max() < 1e-8:
            n_exact += 1
            continue
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(R_compat @ R_ref.T) - 1) / 2, -1, 1)))
        cost_c = ref_pe.PoseEstimator._vp_cost(R_compat, Delta_cam, D_world)
        cost_r = ref_pe.PoseEstimator._vp_cost(R_ref, Delta_cam, D_world)
        assert ang < 0.05 and cost_c <= cost_r + 1e-6 * (1.0 + cost_r), (
            i, ang, cost_c, cost_r)
    assert n_exact >= int(0.8 * n_trials), f"only {n_exact}/{n_trials} exact"


def test_lm_converges_on_consistent_problem(rng):
    """With consistent Delta = R_true @ D_world and a small initial error,
    LM must converge to R_true."""
    cfg = VpConfig()
    for _ in range(5):
        D_world = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(D_world) < 0:
            D_world[:, 2] *= -1
        R_true = _so3_exp_np(rng.normal(size=3) * 0.3)
        Delta_cam = R_true @ D_world
        R0 = _so3_exp_np(rng.normal(size=3) * 0.05) @ R_true
        R_opt = optimize_rotation_from_vps(R0, Delta_cam, D_world, cfg)
        err = np.rad2deg(np.arccos(np.clip(
            (np.trace(R_opt @ R_true.T) - 1) / 2, -1, 1)))
        assert err < 0.5, f"LM did not converge: {err:.2f} deg"


def test_manhattan_dirs_gate_agreement(ref_pe, phone):
    gray, K = phone
    est = ref_pe.PoseEstimator(K, use_vp_refinement=True)
    D_ref, ok_ref, dbg_ref = est._estimate_manhattan_dirs(gray, rng_seed=0)
    cfg = VpConfig(enabled=True)
    D_ours, ok_ours, dbg_ours = estimate_manhattan_dirs(gray, K, cfg, rng_seed=0)
    assert ok_ours == ok_ref
    if ok_ref and ok_ours:
        # dominant vanishing direction agrees within 10 degrees
        best = max(abs(float(D_ours[:, j] @ D_ref[:, 0])) for j in range(3))
        assert np.rad2deg(np.arccos(min(1.0, best))) < 10.0
        # gate decision (reliability) agrees with the reference's own stats
        gate_ref = (dbg_ref["acc_max"] >= cfg.acc_min
                    and dbg_ref["vp2_score"] >= cfg.vp2_min)
        gate_ours = (dbg_ours["acc_max"] >= cfg.acc_min
                     and dbg_ours["vp2_score"] >= cfg.vp2_min)
        assert gate_ours == gate_ref


def test_refine_identity_when_gates_fail(phone):
    gray, K = phone
    # absurdly high gates -> refinement must return R_rel unchanged
    cfg = VpConfig(enabled=True, acc_min=1e18, vp2_min=1e18)
    R_rel = _so3_exp_np(np.array([0.01, 0.02, -0.01]))
    R_out, used, dbg = refine_rotation_with_vps(
        gray, gray, np.eye(3), R_rel, K, cfg)
    assert not used
    np.testing.assert_array_equal(R_out, R_rel)
    assert dbg["reliability"] == {"prev_reliable": False,
                                  "new_reliable": False}


def test_refine_applies_when_gates_pass(phone):
    """With permissive gates and a perturbed R_rel on the same frame, the LM
    step must move the rotation toward lower VP cost and be accepted."""
    gray, K = phone
    cfg = VpConfig(enabled=True, acc_min=0.0, vp2_min=0.0)
    Delta, ok, _ = estimate_manhattan_dirs(gray, K, cfg, rng_seed=0)
    assert ok
    R_prev = np.eye(3)
    # true relative rotation identity (same frame); perturb the estimate
    R_rel_bad = _so3_exp_np(np.array([0.03, -0.02, 0.04]))
    R_out, used, dbg = refine_rotation_with_vps(
        gray, gray, R_prev, R_rel_bad, K, cfg)
    assert used
    # acceptance contract: only applied because cost strictly improved
    assert dbg["optimization"]["cost_opt"] < \
        dbg["optimization"]["cost_init"] - cfg.cost_improve_eps
    # (NOTE: with permissive gates on a weak scene the VP axes carry a sign/
    # permutation ambiguity, so "lower cost" does not imply "closer to the
    # true rotation" — exactly why the reference defaults its gates so high.)


def test_jit_lm_matches_host_lm():
    """optimize_rotation_from_vps_jit (device, lax.scan) == numpy twin
    to f32 tolerance on synthetic consistent problems (SURVEY.md §7 step 8:
    the jit-compatible LM override)."""
    import jax

    from rpe_tpu.geometry.vp_refine import optimize_rotation_from_vps_jit

    lrng = np.random.default_rng(7)
    cfg = VpConfig()
    jit_lm = jax.jit(optimize_rotation_from_vps_jit, static_argnums=(3, 4, 5))
    for trial in range(10):
        D_world = np.linalg.qr(lrng.normal(size=(3, 3)))[0]
        w = lrng.normal(size=3)
        w = w / np.linalg.norm(w) * np.deg2rad(5.0)
        R_true = _so3_exp_np(w)
        Delta_cam = R_true @ D_world
        # start a few degrees off the optimum
        w0 = lrng.normal(size=3)
        w0 = w0 / np.linalg.norm(w0) * np.deg2rad(3.0)
        R_init = _so3_exp_np(w0) @ R_true
        R_np = optimize_rotation_from_vps(R_init, Delta_cam, D_world, cfg)
        R_dev = np.asarray(jit_lm(R_init, Delta_cam, D_world,
                                  cfg.iters, cfg.lm_lambda, +1.0))
        # Both converge to the optimum; compare geodesically. Gate 0.05 deg:
        # the jit twin runs f32 and arccos near s=1 has a ~sqrt(eps_f32)
        # conditioning floor (~0.02-0.03 deg) — under the subsystem's own
        # acceptance eps of 1e-3 rad (0.057 deg) of summed cost.
        cosang = np.clip((np.trace(R_np.T @ R_dev) - 1.0) / 2.0, -1.0, 1.0)
        assert np.degrees(np.arccos(cosang)) < 0.05, f"trial {trial}"
        # and the jit result actually solved the problem
        cos2 = np.clip((np.trace(R_true.T @ R_dev) - 1.0) / 2.0, -1.0, 1.0)
        assert np.degrees(np.arccos(cos2)) < 0.05, f"trial {trial} vs truth"
