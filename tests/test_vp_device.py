"""Device-resident (jittable) VP refinement path vs the host twins.

Covers SURVEY.md §7 step 8's jit-compatible override end to end: LSD
segment extraction as segment reductions (ops/lsd.py
detect_line_segments_device), all-pairs Gaussian-sphere voting
(geometry/vp_refine.py _dirs_from_lines_device), and the lax.scan LM —
one XLA program with jnp.where acceptance (reference semantics
pose_estimator.py:536-567)."""

import cv2
import jax
import numpy as np
import pytest

from rpe_tpu.config import VpConfig
from rpe_tpu.geometry.vp_refine import (
    _dirs_from_lines_device,
    _so3_exp_np,
    estimate_manhattan_dirs_device,
    refine_rotation_with_vps_device,
)
from rpe_tpu.ops.lsd import detect_line_segments, detect_line_segments_device

PHONE_IMG = "/root/reference/evaluation-runs/phone-data/data/images/000000.png"
PHONE_CAL = ("/root/reference/evaluation-runs/phone-data/data/"
             "calibration_scaled.npz")


@pytest.fixture(scope="module")
def phone():
    gray = cv2.imread(PHONE_IMG, cv2.IMREAD_GRAYSCALE)
    K = np.load(PHONE_CAL)["K"]
    return gray.astype(np.float32), K.astype(np.float32)


def _match_unordered(seg_a, seg_b, tol):
    """Endpoint-pair match irrespective of endpoint order."""
    a1, a2 = seg_a[:2], seg_a[2:]
    b1, b2 = seg_b[:2], seg_b[2:]
    d_fwd = max(np.linalg.norm(a1 - b1), np.linalg.norm(a2 - b2))
    d_rev = max(np.linalg.norm(a1 - b2), np.linalg.norm(a2 - b1))
    return min(d_fwd, d_rev) < tol


def test_device_segments_match_host(phone):
    """Every host segment has a device twin with the same endpoints.

    Host reduces per-component moments in f64 with np.bincount; the device
    twin scatters in f32 — endpoint agreement gate 1.0 px."""
    gray, _ = phone
    host = detect_line_segments(gray)
    segs, valid = detect_line_segments_device(gray, max_segments=512)
    segs = np.asarray(segs)[np.asarray(valid)]

    assert host.shape[0] >= 10  # scene sanity: the phone frame has lines
    # device slot budget covers the host's component count on this frame
    assert host.shape[0] <= 512
    assert segs.shape[0] == host.shape[0]
    matched = sum(
        any(_match_unordered(h, d, tol=1.0) for d in segs) for h in host)
    assert matched == host.shape[0], f"{matched}/{host.shape[0]} matched"


def _manhattan_scene(rng, h=480, w=640, n_per_vp=18):
    """Synthetic Manhattan frame: stripes converging on the three VPs of a
    known camera rotation (all VPs finite), plus its K and R_cam."""
    K = np.array([[520.0, 0.0, w / 2], [0.0, 520.0, h / 2], [0.0, 0.0, 1.0]],
                 np.float32)
    R_cam = _so3_exp_np(np.array([0.45, -0.55, 0.35]))
    img = np.full((h, w), 30, np.uint8)
    for axis in range(3):
        d = R_cam @ np.eye(3)[:, axis]
        vp = K @ d
        assert abs(vp[2]) > 1e-3  # finite VP by construction
        vp = vp[:2] / vp[2]
        for _ in range(n_per_vp):
            p = np.array([rng.uniform(0.15 * w, 0.85 * w),
                          rng.uniform(0.15 * h, 0.85 * h)])
            u = vp - p
            u = u / (np.linalg.norm(u) + 1e-9)
            half = rng.uniform(40.0, 90.0)
            a = (p - half * u).astype(int)
            b = (p + half * u).astype(int)
            cv2.line(img, tuple(a), tuple(b), 225, thickness=3,
                     lineType=cv2.LINE_AA)
    return img.astype(np.float32), K, R_cam


def test_device_dirs_recover_manhattan_frame(rng):
    """Voting on device recovers the constructed camera's Manhattan
    directions (up to column permutation/sign, as the reference's VP
    ordering is score-based)."""
    img, K, R_cam = _manhattan_scene(rng)
    cfg = VpConfig(enabled=True)
    Delta, ok, stats = jax.jit(
        lambda g: estimate_manhattan_dirs_device(g, K, cfg))(img)
    assert bool(ok)
    Delta = np.asarray(Delta, np.float64)
    # each true direction is some column of Delta up to sign
    for axis in range(3):
        d = R_cam @ np.eye(3)[:, axis]
        best = max(abs(float(d @ Delta[:, j])) for j in range(3))
        ang = np.degrees(np.arccos(min(1.0, best)))
        assert ang < 3.0, f"axis {axis}: {ang:.2f} deg"


def test_device_voting_matches_host_all_pairs(rng):
    """With < 78 lines both twins vote ALL pairs (no sampling, no rescale)
    — accumulator statistics must agree to f32 tolerance."""
    from rpe_tpu.geometry.vp_refine import _dirs_from_lines

    img, K, _ = _manhattan_scene(rng, n_per_vp=4)
    host_lines = detect_line_segments(img)
    m = host_lines.shape[0]
    assert 10 <= m, "scene produced too few lines"
    if m * (m - 1) // 2 > 3000:
        pytest.skip("scene dense enough to trigger host sampling")

    cfg = VpConfig(enabled=True)
    D_host, ok_host, dbg_host = _dirs_from_lines(host_lines, K, cfg)

    M = 256
    segs = np.zeros((M, 4), np.float32)
    segs[:m] = host_lines
    valid = np.zeros(M, bool)
    valid[:m] = True
    D_dev, ok_dev, stats = _dirs_from_lines_device(segs, valid, K, cfg)

    assert bool(ok_dev) == bool(ok_host)
    np.testing.assert_allclose(float(stats["acc_max"]), dbg_host["acc_max"],
                               rtol=2e-4)
    np.testing.assert_allclose(float(stats["vp2_score"]),
                               dbg_host["vp2_score"], rtol=2e-4)
    # dominant VP agrees
    D_dev = np.asarray(D_dev, np.float64)
    best = max(abs(float(D_dev[:, j] @ D_host[:, 0])) for j in range(3))
    assert np.degrees(np.arccos(min(1.0, best))) < 2.0


def test_device_refine_recovers_perturbation(rng):
    """Same-frame pair with a perturbed R_rel: the device refinement must
    accept (cost strictly improves) and pull R_rel back to ~identity.
    Delta_new == Delta_prev by construction, so the LM optimum is exact
    regardless of voting quantization."""
    img, K, _ = _manhattan_scene(rng)
    # max_pairs above any scene's line-pair count forces the ALL-PAIRS
    # voting regime: deterministic, so Delta_new == Delta_prev holds.
    # (The default 3000 can flip to WITH-REPLACEMENT sampling — per-role
    # seeds 0/1 like the reference — whenever LSD finds > ~78 segments;
    # the two frames' Deltas then differ by draw and the LM optimum can
    # legitimately sit ~90 deg away on a column swap. The session-scoped
    # rng fixture made this order-dependent: scenes drawn later in the
    # suite produced more segments.)
    cfg = VpConfig(enabled=True, acc_min=0.0, vp2_min=0.0,
                   max_pairs=30000)
    R_rel_bad = _so3_exp_np(np.array([0.03, -0.02, 0.04]))

    fn = jax.jit(lambda a, b, Rp, Rr: refine_rotation_with_vps_device(
        a, b, Rp, Rr, K, cfg))
    R_out, used, stats = fn(img, img, np.eye(3, dtype=np.float32),
                            R_rel_bad.astype(np.float32))
    assert bool(used)
    assert float(stats["cost_opt"]) < \
        float(stats["cost_init"]) - cfg.cost_improve_eps
    R_out = np.asarray(R_out, np.float64)
    # orthonormal result
    np.testing.assert_allclose(R_out @ R_out.T, np.eye(3), atol=1e-4)
    ang = np.degrees(np.arccos(np.clip((np.trace(R_out) - 1) / 2, -1, 1)))
    assert ang < 0.1, f"residual {ang:.3f} deg"


def test_batched_device_dirs_contract_and_gate_agreement(phone, rng):
    """manhattan_dirs_for_frames_device returns the host contract
    (Delta | None, ok, dbg) and agrees with the host twin on the
    reliability DECISION for real frames (default gates) and for a strong
    synthetic Manhattan scene (permissive gates)."""
    from rpe_tpu.geometry.vp_refine import (
        manhattan_dirs_for_frames,
        manhattan_dirs_for_frames_device,
    )

    gray, K = phone
    scene, Ks, _ = _manhattan_scene(rng)
    cfg = VpConfig(enabled=True)

    def reliable(entry, c):
        _, ok, dbg = entry
        return (ok and dbg.get("acc_max", 0.0) >= c.acc_min
                and dbg.get("vp2_score", 0.0) >= c.vp2_min)

    # real frame, default (strict) gates
    host = manhattan_dirs_for_frames(gray[None], K, cfg)
    dev = manhattan_dirs_for_frames_device(gray[None], K, cfg)
    assert len(dev) == 1 and len(dev[0]) == 3
    assert dev[0][1] == host[0][1]  # extraction ok flag
    assert reliable(dev[0], cfg) == reliable(host[0], cfg)

    # synthetic scene, permissive gates: both must pass
    cfg0 = VpConfig(enabled=True, acc_min=0.0, vp2_min=0.0)
    host_s = manhattan_dirs_for_frames(scene[None], Ks, cfg0)
    dev_s = manhattan_dirs_for_frames_device(scene[None], Ks, cfg0)
    assert reliable(dev_s[0], cfg0) and reliable(host_s[0], cfg0)
    # dominant direction agreement between the twins
    Dh, Dd = host_s[0][0], dev_s[0][0]
    best = max(abs(float(Dd[:, j] @ Dh[:, 0])) for j in range(3))
    assert np.degrees(np.arccos(min(1.0, best))) < 2.0


def test_device_refine_passthrough_when_gated(phone):
    """Absurd gates -> R_rel must pass through bit-unchanged (the jnp.where
    select preserves the geometric answer exactly)."""
    gray, K = phone
    cfg = VpConfig(enabled=True, acc_min=1e18, vp2_min=1e18)
    R_rel = _so3_exp_np(np.array([0.01, 0.02, -0.01])).astype(np.float32)
    R_out, used, _ = refine_rotation_with_vps_device(
        gray, gray, np.eye(3, dtype=np.float32), R_rel, K, cfg)
    assert not bool(used)
    np.testing.assert_array_equal(np.asarray(R_out), R_rel)


def test_device_sampled_voting_matches_host_statistics(phone):
    """Round-5 fix for the round-4 VP_DEVICE failure (PARITY.md): above
    max_pairs the device twin now reproduces the reference's
    with-replacement pair sampling (counter-based PRNG) instead of the
    all-pairs + expectation-rescale vote whose max bin undercounted
    3-100x. Same segments fed to both twins (LSD differences must not
    confound); draws differ (numpy vs threefry), so the assertion is
    distributional: acc_max / vp2_score within 3x, and the production
    gate decisions agree."""
    from rpe_tpu.geometry.vp_refine import _dirs_from_lines

    gray, K = phone
    cfg = VpConfig(enabled=True)
    segs, valid = detect_line_segments_device(gray)
    segs_np = np.asarray(segs)[np.asarray(valid)]
    n_live = segs_np.shape[0]
    # must be in the sampling regime for this test to bite
    L = min(cfg.max_lines, n_live)
    assert L * (L - 1) // 2 > cfg.max_pairs, "not in sampling regime"

    # vp2_score is an extreme-value statistic over a 360-bin scan and is
    # inherently seed-noisy in BOTH twins (host measured 0..16843 across
    # seeds 0..3 on this frame), so per-seed equality is meaningless;
    # the twins are compared as DISTRIBUTIONS over seeds, plus per-seed
    # gate decisions at the production thresholds.
    accs_h, accs_d, vp2s_h, vp2s_d = [], [], [], []
    for seed in range(4):
        _, ok_h, dbg_h = _dirs_from_lines(segs_np, K, cfg, rng_seed=seed)
        _, ok_d, st_d = _dirs_from_lines_device(segs, valid, K, cfg,
                                                rng_seed=seed)
        acc_h, acc_d = dbg_h["acc_max"], float(st_d["acc_max"])
        vp2_h, vp2_d = dbg_h["vp2_score"], float(st_d["vp2_score"])
        accs_h.append(acc_h)
        accs_d.append(acc_d)
        vp2s_h.append(vp2_h)
        vp2s_d.append(vp2_d)
        gate_h = (bool(ok_h) and acc_h >= cfg.acc_min
                  and vp2_h >= cfg.vp2_min)
        gate_d = (bool(ok_d) and acc_d >= cfg.acc_min
                  and vp2_d >= cfg.vp2_min)
        assert gate_h == gate_d, (seed, acc_h, acc_d, vp2_h, vp2_d)
    # distributional agreement: device range within 3x of the host range
    # (the pre-fix all-pairs rescale undercounted acc_max 3-100x, so this
    # catches a regression to that regime while tolerating seed noise)
    assert max(accs_d) > min(accs_h) / 3, (accs_h, accs_d)
    assert min(accs_d) < max(accs_h) * 3, (accs_h, accs_d)
    assert max(vp2s_d) > min(v for v in vp2s_h if v > 0) / 5, \
        (vp2s_h, vp2s_d)
    assert min(vp2s_d) < max(vp2s_h) * 5, (vp2s_h, vp2s_d)
