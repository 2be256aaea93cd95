"""Batched Nister 5-point solver (hidden-variable formulation) vs synthetic
ground truth and inside RANSAC (BASELINE.json config #3)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from rpe_tpu.geometry.five_point import (
    _build_constraint_coeffs,
    _det10_lu,
    _householder_null4,
    _M3,
    five_point_essential,
)
from rpe_tpu.geometry import (
    normalize_points,
    ransac_essential,
    recover_pose,
    rotation_error,
    sampson_error_sq,
    so3_exp,
)


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _minimal_problem(rng, n=5, noise=0.0):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * np.deg2rad(rng.uniform(2, 30))
    R = np.asarray(so3_exp(w))
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform([-2, -2, 3], [2, 2, 10], size=(n, 3))
    x1 = X / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2 / X2[:, 2:3]
    p1 = (x1[:, :2] + rng.normal(size=(n, 2)) * noise).astype(np.float32)
    p2 = (x2[:, :2] + rng.normal(size=(n, 2)) * noise).astype(np.float32)
    E = skew(t) @ R
    return p1, p2, E / np.linalg.norm(E), R, t


def test_det10_matches_numpy(rng):
    M = rng.normal(size=(8, 10, 10)).astype(np.float32)
    d = np.asarray(_det10_lu(jnp.asarray(M)))
    np.testing.assert_allclose(d, np.linalg.det(M), rtol=1e-4)


def test_nullspace_and_constraints(rng):
    A = rng.normal(size=(3, 5, 9)).astype(np.float32)
    N4 = np.asarray(_householder_null4(jnp.asarray(A)))
    assert np.abs(np.einsum("bij,bjk->bik", A, N4)).max() < 1e-5
    coeffs = np.asarray(_build_constraint_coeffs(jnp.asarray(N4)))
    # evaluate constraint polynomials at random points vs direct computation
    for b in range(3):
        x, y, z = rng.normal(size=3)
        E = (x * N4[b][:, 0] + y * N4[b][:, 1] + z * N4[b][:, 2]
             + N4[b][:, 3]).reshape(3, 3)
        monos = np.array([x ** a * y ** bb * z ** c for (a, bb, c) in _M3])
        vals = coeffs[b] @ monos
        C = 2 * E @ E.T @ E - np.trace(E @ E.T) * E
        direct = np.concatenate([[np.linalg.det(E)], C.reshape(-1)])
        np.testing.assert_allclose(vals, direct, atol=1e-4)


def test_recovers_true_essential_on_minimal_problems(rng):
    hits, total = 0, 20
    for _ in range(total):
        p1, p2, E_gt, _, _ = _minimal_problem(rng)
        Es, valid = five_point_essential(jnp.asarray(p1[None]),
                                         jnp.asarray(p2[None]))
        Es, valid = np.asarray(Es)[0], np.asarray(valid)[0]
        best = 1e9
        for E, v in zip(Es, valid):
            if not v:
                continue
            E = E / np.linalg.norm(E)
            best = min(best, np.linalg.norm(E - E_gt),
                       np.linalg.norm(E + E_gt))
        if best < 1e-3:
            hits += 1
    # occasional double roots escape the sign-change grid; RANSAC absorbs it
    assert hits >= int(0.8 * total), f"{hits}/{total}"


def test_all_returned_roots_satisfy_the_minimal_problem(rng):
    p1, p2, _, _, _ = _minimal_problem(rng)
    Es, valid = five_point_essential(jnp.asarray(p1[None]),
                                     jnp.asarray(p2[None]))
    Es, valid = np.asarray(Es)[0], np.asarray(valid)[0]
    assert valid.sum() >= 1
    for E, v in zip(Es, valid):
        if v:
            d = np.asarray(sampson_error_sq(
                jnp.asarray(E), jnp.asarray(p1), jnp.asarray(p2)))
            assert d.max() < 1e-8


def _near_planar_problem(rng, n=5, offplane=1e-3):
    """Minimal sample with all points on (almost) one plane — the adversarial
    regime for the unpivoted determinant LU (near-zero pivots) and the one
    where the 8pt solver degenerates outright."""
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * np.deg2rad(rng.uniform(2, 25))
    R = np.asarray(so3_exp(w))
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    ab = rng.uniform(-0.4, 0.4, size=2)
    xy = rng.uniform(-2, 2, size=(n, 2))
    zz = 6.0 + xy @ ab + offplane * rng.normal(size=n)
    X = np.concatenate([xy, zz[:, None]], axis=1)
    x1 = X / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2 / X2[:, 2:3]
    E = skew(t) @ R
    return (x1[:, :2].astype(np.float32), x2[:, :2].astype(np.float32),
            E / np.linalg.norm(E))


def _oracle_gt_hit(coeffs_np, null4_np, E_gt, tol=1e-3):
    """Pivoted float64 oracle: does the tan-grid + LAPACK-det + bisection
    route recover the ground-truth essential matrix for this sample?"""
    from rpe_tpu.geometry.five_point import _hidden_var_table

    S = _hidden_var_table().astype(np.float64)
    c = coeffs_np.astype(np.float64)

    def detM(z):
        zp = np.array([1.0, z, z * z, z ** 3])
        return np.linalg.det(np.einsum("em,mgc,c->eg", c, S, zp))

    t = np.linspace(-0.5 * np.pi + 1e-3, 0.5 * np.pi - 1e-3, 97)
    d = np.array([detM(np.tan(ti)) for ti in t])
    best = np.inf
    for g in np.nonzero(np.sign(d[:-1]) * np.sign(d[1:]) < 0)[0]:
        lo, hi, dlo = t[g], t[g + 1], d[g]
        for _ in range(50):
            mid = 0.5 * (lo + hi)
            dm = detM(np.tan(mid))
            if np.sign(dm) * np.sign(dlo) >= 0:
                lo, dlo = mid, dm
            else:
                hi = mid
        z = np.tan(0.5 * (lo + hi))
        zp = np.array([1.0, z, z * z, z ** 3])
        M = np.einsum("em,mgc,c->eg", c, S, zp)
        m = np.linalg.svd(M)[2][-1]
        if abs(m[9]) < 1e-12:
            continue
        x, y = m[7] / m[9], m[8] / m[9]
        e = (x * null4_np[:, 0] + y * null4_np[:, 1]
             + z * null4_np[:, 2] + null4_np[:, 3])
        E = (e / np.linalg.norm(e)).reshape(3, 3)
        best = min(best, np.linalg.norm(E - E_gt), np.linalg.norm(E + E_gt))
    return best < tol


def test_near_planar_root_recall_vs_pivoted_f64_oracle(rng):
    """The no-pivot LU rationale (five_point._det10_lu docstring), tested
    directly: on near-planar minimal samples, ground-truth-root recall of
    the f32 unpivoted production path must match a pivoted float64 LAPACK
    oracle running the same grid + bisection (allowing a small slack for
    f32 borderline evaluations; RANSAC retries absorb individual misses)."""
    B = 40
    solver_hits = oracle_hits = both_possible = 0
    for _ in range(B):
        p1, p2, E_gt = _near_planar_problem(rng)
        A = jnp.asarray(p1[None]), jnp.asarray(p2[None])
        from rpe_tpu.geometry.epipolar import _build_epipolar_rows

        rows = _build_epipolar_rows(*A)
        null4 = _householder_null4(rows)
        coeffs = _build_constraint_coeffs(null4)
        rn = jnp.sqrt(jnp.sum(coeffs * coeffs, axis=-1, keepdims=True)
                      + 1e-20)
        coeffs_n = np.asarray(coeffs / rn)[0]
        if _oracle_gt_hit(coeffs_n, np.asarray(null4)[0], E_gt):
            oracle_hits += 1

        Es, valid = five_point_essential(*A)
        Es, valid = np.asarray(Es)[0], np.asarray(valid)[0]
        best = np.inf
        for E, v in zip(Es, valid):
            if v:
                E = E / np.linalg.norm(E)
                best = min(best, np.linalg.norm(E - E_gt),
                           np.linalg.norm(E + E_gt))
        if best < 1e-3:
            solver_hits += 1
    assert oracle_hits >= int(0.75 * B), f"oracle only {oracle_hits}/{B}"
    assert solver_hits >= oracle_hits - 3, (
        f"solver {solver_hits}/{B} vs pivoted f64 oracle {oracle_hits}/{B}")


def test_near_planar_root_recall_fused_kernel(rng):
    """Same adversarial regime through the Pallas fused-solve path
    (interpret mode): in-kernel backsub extraction + GN must keep the
    ground-truth-root recall of the XLA nullvector path."""
    from rpe_tpu.geometry.epipolar import _build_epipolar_rows
    from rpe_tpu.ops.five_point_pallas import solve_roots_polished

    B = 40
    P1, P2, EG = [], [], []
    for _ in range(B):
        p1, p2, E_gt = _near_planar_problem(rng)
        P1.append(p1)
        P2.append(p2)
        EG.append(E_gt)
    A1, A2 = jnp.asarray(np.stack(P1)), jnp.asarray(np.stack(P2))
    rows = _build_epipolar_rows(A1, A2)
    null4 = _householder_null4(rows)
    coeffs = _build_constraint_coeffs(null4)
    rn = jnp.sqrt(jnp.sum(coeffs * coeffs, axis=-1, keepdims=True) + 1e-20)
    coeffs = coeffs / rn

    x, y, rv, flip, has = (np.asarray(a) for a in
                           solve_roots_polished(coeffs, interpret=True))
    # XLA-path recall on the same coeffs for the comparison baseline
    from rpe_tpu.geometry.five_point import five_point_essential

    Es_x, ok_x = (np.asarray(a) for a in five_point_essential(A1, A2))

    n4 = np.asarray(null4)
    k_hits = x_hits = 0
    for b in range(B):
        best = np.inf
        for r in range(10):
            if not has[b, r]:
                continue
            cz = 1.0 if flip[b, r] else rv[b, r]
            cw = rv[b, r] if flip[b, r] else 1.0
            e = (x[b, r] * n4[b][:, 0] + y[b, r] * n4[b][:, 1]
                 + cz * n4[b][:, 2] + cw * n4[b][:, 3])
            nn = np.linalg.norm(e)
            if not np.isfinite(nn) or nn < 1e-12:
                continue
            E = (e / nn).reshape(3, 3)
            best = min(best, np.linalg.norm(E - EG[b]),
                       np.linalg.norm(E + EG[b]))
        if best < 1e-3:
            k_hits += 1
        bx = np.inf
        for E, v in zip(Es_x[b], ok_x[b]):
            if v:
                E = E / np.linalg.norm(E)
                bx = min(bx, np.linalg.norm(E - EG[b]),
                         np.linalg.norm(E + EG[b]))
        if bx < 1e-3:
            x_hits += 1
    assert k_hits >= x_hits - 3, (
        f"kernel {k_hits}/{B} vs XLA path {x_hits}/{B}")


def test_ransac_5pt_succeeds_with_exactly_five_matches(rng):
    """Reference parity: cv2.findEssentialMat's 5pt path works at N=5
    (src/core/pose_estimator.py:514 requires only >=5 matches). At exactly
    5 points the solution is inherently ambiguous (up to 10 essential roots
    fit all 5 points with zero error, and several are fully cheirality-
    consistent — OpenCV has the same ambiguity), so the contract is: ok=True
    and a model consistent with every match, not the unique true pose."""
    for trial in range(5):
        p1, p2, _, _, _ = _minimal_problem(rng)
        res = ransac_essential(
            jax.random.PRNGKey(trial), jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(5, bool), 1.0 / 700.0,
            num_hypotheses=64, solver="5pt")
        assert bool(res["ok"])
        assert int(res["num_inliers"]) == 5
        d = np.asarray(sampson_error_sq(
            res["E"], jnp.asarray(p1), jnp.asarray(p2)))
        assert d.max() < 1e-6, "returned model must fit all 5 matches"


def test_ransac_5pt_exact_pose_with_six_and_seven_matches(rng):
    """6-7 matches (below the old >=8 floor) disambiguate the root set:
    the true pose must be recovered exactly on noise-free data."""
    for n in (6, 7):
        for trial in range(3):
            p1, p2, _, R_gt, _ = _minimal_problem(rng, n=n)
            res = ransac_essential(
                jax.random.PRNGKey(trial), jnp.asarray(p1), jnp.asarray(p2),
                jnp.ones(n, bool), 1.0 / 700.0,
                num_hypotheses=64, solver="5pt")
            assert bool(res["ok"])
            R, _, _, _ = recover_pose(res["E"], jnp.asarray(p1),
                                      jnp.asarray(p2), res["inlier_mask"])
            err = float(rotation_error(R, jnp.asarray(R_gt)))
            assert err < 0.1, f"n={n} trial={trial}: {err:.3f} deg"


def test_ransac_8pt_still_requires_eight(rng):
    """The 8pt path keeps its >=8 floor: 5 matches -> ok=False."""
    p1, p2, _, _, _ = _minimal_problem(rng)
    res = ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(5, bool), 1.0 / 700.0, num_hypotheses=64, solver="8pt")
    assert not bool(res["ok"])


def test_ransac_5pt_pose_accuracy(rng):
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * np.deg2rad(10)
    R_gt = np.asarray(so3_exp(w))
    t_gt = rng.normal(size=3)
    t_gt /= np.linalg.norm(t_gt)
    n = 200
    X = rng.uniform([-4, -3, 4], [4, 3, 12], size=(n, 3))
    p1 = (X / X[:, 2:3]) @ K.T
    X2 = X @ R_gt.T + t_gt
    p2 = (X2 / X2[:, 2:3]) @ K.T
    p1 = p1[:, :2] + rng.normal(size=(n, 2)) * 0.3
    p2 = p2[:, :2] + rng.normal(size=(n, 2)) * 0.3
    out = rng.choice(n, 50, replace=False)
    p2[out] = rng.uniform([0, 0], [640, 480], size=(50, 2))

    n1 = normalize_points(jnp.asarray(p1, jnp.float32), jnp.asarray(K, jnp.float32))
    n2 = normalize_points(jnp.asarray(p2, jnp.float32), jnp.asarray(K, jnp.float32))
    res = ransac_essential(jax.random.PRNGKey(0), n1, n2,
                           jnp.ones(n, bool), 1.0 / 700.0,
                           num_hypotheses=256, solver="5pt")
    assert bool(res["ok"])
    R, t, _, _ = recover_pose(res["E"], n1, n2, res["inlier_mask"])
    err = float(rotation_error(R, jnp.asarray(R_gt)))
    assert err < 0.5, f"5pt RANSAC rotation error {err:.3f} deg"
