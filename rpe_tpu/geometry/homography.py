"""Homography estimation + plane-degeneracy recovery (DEGENSAC-style).

Dominant-plane scenes break essential-matrix RANSAC: correspondences on
one plane satisfy ANY fundamental matrix of the 2-parameter family
F = [e']_x H (H the plane's homography, e' a free epipole), so a wrong-
rotation E can collect MORE inliers than the true one (measured on the
simulator pair 150->165: a 4.8-deg-wrong E refits to 248/328 inliers at
1 px vs the true model's 246 — docs/PERF_LOG.md round-4 item 3). Neither
the reference's cv2.findEssentialMat (reference
src/core/pose_estimator.py:505-527, which scores 5.77 deg on that pair)
nor count/loss/cheirality re-ranking can resolve it; the standard cure is
DEGENSAC (Chum, Werner, Matas: "Two-view geometry estimation unaffected
by a dominant plane", CVPR 2005): detect an H that explains most of the
winner's support, then re-estimate the epipolar geometry from the plane
PLUS off-plane points (plane-and-parallax: two off-plane correspondences
pin the epipole, F = [e']_x H).

TPU-first shape discipline: fixed hypothesis batches, masked validity,
no data-dependent shapes — the whole recovery is one jittable block
appended to geometry/ransac.ransac_essential (gated by
RansacConfig.degensac).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .eig import smallest_eigvec_sym
from .epipolar import project_to_essential, sampson_error_sq

_EPS = 1e-12


def _build_dlt_rows(pts1, pts2):
    """Standard DLT rows for x2 ~ H x1: (..., N, 2) x2 -> (..., 2N, 9).

    h = vec(H) row-major; rows are the two independent equations of
    x2 x (H x1) = 0.
    """
    x, y = pts1[..., 0], pts1[..., 1]
    u, v = pts2[..., 0], pts2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    return jnp.concatenate([r1, r2], axis=-2)


def dlt_homography(pts1, pts2, weights=None):
    """Weighted DLT homography (..., N, 2) x2 -> (..., 3, 3), x2 ~ H x1.

    Same normal-matrix + Cholesky-inverse-iteration nullvector machinery
    as epipolar.eight_point (XLA's batched eigh is ~1000x slower on these
    tiny matrices — CLAUDE.md perf rule). Points are expected in
    K-normalized camera coordinates (already ~unit scale, so no extra
    Hartley rescaling — same argument as eight_point's docstring).
    """
    A = _build_dlt_rows(pts1, pts2)                    # (..., 2N, 9)
    if weights is not None:
        w2 = jnp.repeat(weights, 2, axis=-1)
        A = A * w2[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    h = smallest_eigvec_sym(AtA)
    return h.reshape(*h.shape[:-1], 3, 3)


def homography_transfer_err_sq(H, pts1, pts2):
    """Forward transfer error |proj(H x1) - x2|^2, (..., 3, 3) x (N, 2)."""
    x = pts1[..., 0]
    y = pts1[..., 1]
    px = H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]
    py = H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]
    pw = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    inv = jnp.where(jnp.abs(pw) > _EPS, 1.0 / pw, 0.0)
    du = px * inv - pts2[..., 0]
    dv = py * inv - pts2[..., 1]
    err = du * du + dv * dv
    # behind-the-plane / near-infinity projections are misses, not zeros
    return jnp.where(jnp.abs(pw) > _EPS, err, jnp.inf)


def ransac_homography(key, pts1_n, pts2_n, valid_mask, threshold_n,
                      num_hypotheses: int = 64):
    """Small batched-hypothesis homography RANSAC + one weighted refit.

    Returns (H (3,3), inlier_mask (N,), num_inliers ()). Follows
    ransac_essential's structure: fixed hypothesis batch, masked scoring,
    count-then-loss selection.
    """
    from .ransac import sample_minimal_indices

    n = pts1_n.shape[0]
    idx = sample_minimal_indices(key, valid_mask, num_hypotheses,
                                 sample_size=4)
    s1 = jnp.take(pts1_n, idx, axis=0)                 # (H, 4, 2)
    s2 = jnp.take(pts2_n, idx, axis=0)
    Hh = dlt_homography(s1, s2)                        # (H, 3, 3)

    thr2 = threshold_n * threshold_n
    d2 = homography_transfer_err_sq(Hh[:, None], pts1_n[None], pts2_n[None])
    d2 = jnp.where(jnp.isfinite(d2), d2, thr2)
    inl = (d2 < thr2) & valid_mask[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    trunc = jnp.sum(jnp.minimum(d2, thr2) * valid_mask[None, :], axis=-1)
    rank = jnp.argsort(jnp.argsort(trunc))
    best = jnp.argmax(counts * jnp.int32(num_hypotheses)
                      - rank.astype(jnp.int32))

    H_best = Hh[best]
    mask = inl[best]
    # one weighted refit on the inlier set (guarded like the E refit)
    H_new = dlt_homography(pts1_n, pts2_n,
                           weights=mask.astype(pts1_n.dtype))
    d2n = homography_transfer_err_sq(H_new, pts1_n, pts2_n)
    d2n = jnp.where(jnp.isfinite(d2n), d2n, thr2)
    mask_new = (d2n < thr2) & valid_mask
    better = (jnp.sum(mask_new.astype(jnp.int32))
              >= jnp.sum(mask.astype(jnp.int32)))
    enough = jnp.sum(mask.astype(jnp.int32)) >= 4
    take = better & enough
    H_best = jnp.where(take, H_new, H_best)
    mask = jnp.where(take, mask_new, mask)
    return H_best, mask, jnp.sum(mask.astype(jnp.int32))


def gric_score(d2, valid_mask, sigma2, d_dim: float, k_par: float):
    """Torr's GRIC for a model fit over two-view correspondences.

    GRIC = sum_i rho(e_i^2/sigma^2) + d*n*log(r) + k*log(r*n), with
    rho(x) = min(x, 2*(r - d)) and r = 4 (correspondences live in R^4).
    Essential matrix: d=3 (3-D variety), k=5; homography: d=2, k=8.
    Lower is better. (Torr, "An assessment of information criteria for
    motion model selection", CVPR 1997 — the H-vs-F/E selection DEGENSAC
    builds on.) d2 are squared residuals in the same normalized units as
    sigma2 (Sampson for E, transfer for H).
    """
    r = 4.0
    n = jnp.sum(valid_mask.astype(d2.dtype))
    rho = jnp.minimum(d2 / sigma2, 2.0 * (r - d_dim))
    return (jnp.sum(jnp.where(valid_mask, rho, 0.0))
            + d_dim * n * jnp.log(r) + k_par * jnp.log(r * n + _EPS))


def _skew(e):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    z = jnp.zeros_like(e[..., 0])
    return jnp.stack([
        jnp.stack([z, -e[..., 2], e[..., 1]], axis=-1),
        jnp.stack([e[..., 2], z, -e[..., 0]], axis=-1),
        jnp.stack([-e[..., 1], e[..., 0], z], axis=-1),
    ], axis=-2)


def plane_parallax_essentials(key, H, pts1_n, pts2_n, offplane_mask,
                              num_hypotheses: int = 64):
    """Essential candidates from the plane + pairs of off-plane points.

    For each hypothesis, two off-plane correspondences (a, b) pin the
    epipole in image 2: e' = ((H x1a) x x2a) x ((H x1b) x x2b) — each
    line joins a point to its plane-induced image and passes through e'
    (plane-and-parallax). Then F = [e']_x H, projected to the essential
    manifold. Returns (E (P, 3, 3), ok (P,)).
    """
    from .ransac import sample_minimal_indices

    idx = sample_minimal_indices(key, offplane_mask, num_hypotheses,
                                 sample_size=2)
    def h1(p):
        return jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), p.dtype)],
                               axis=-1)

    xa1 = h1(jnp.take(pts1_n, idx[:, 0], axis=0))      # (P, 3)
    xa2 = h1(jnp.take(pts2_n, idx[:, 0], axis=0))
    xb1 = h1(jnp.take(pts1_n, idx[:, 1], axis=0))
    xb2 = h1(jnp.take(pts2_n, idx[:, 1], axis=0))

    Ha = jnp.einsum("ij,pj->pi", H, xa1)
    Hb = jnp.einsum("ij,pj->pi", H, xb1)
    la = jnp.cross(Ha, xa2)
    lb = jnp.cross(Hb, xb2)
    e = jnp.cross(la, lb)                              # (P, 3) epipole im2
    en = jnp.linalg.norm(e, axis=-1)
    ok = jnp.isfinite(en) & (en > 1e-9)
    e = e / (en[..., None] + _EPS)
    F = jnp.matmul(_skew(e), H[None],
                   precision=jax.lax.Precision.HIGHEST)  # (P, 3, 3)
    E, _, _ = project_to_essential(F)
    ok = ok & jnp.isfinite(E).all(axis=(-2, -1))
    return E, ok


def degensac_rescue(key, E_best, inlier_mask, num_inliers,
                    pts1_n, pts2_n, valid_mask, threshold_n,
                    h_hypotheses: int = 64, pp_hypotheses: int = 64,
                    h_frac: float = 0.8, min_offplane: int = 8):
    """Dominant-plane test + plane-and-parallax re-estimation.

    Appended to ransac_essential's winner (one jittable block, fixed
    shapes). When a homography explains >= h_frac of the winning E's
    inliers, the pair is declared H-degenerate and the essential matrix
    is re-estimated as F = [e']_x H with the epipole pinned by pairs of
    off-plane matches; the rescue replaces E_best iff its OFF-PLANE
    support beats E_best's (on-plane counts cannot discriminate — every
    member of the degenerate family explains the plane).

    Returns (E, inlier_mask, num_inliers, used (bool), h_count).
    """
    n = pts1_n.shape[0]
    thr2 = threshold_n * threshold_n
    kH, kPP = jax.random.split(key)

    H, h_mask, h_cnt = ransac_homography(
        kH, pts1_n, pts2_n, inlier_mask, threshold_n,
        num_hypotheses=h_hypotheses)

    # Degeneracy test: the original support-fraction rule OR GRIC model
    # selection (H beats E on the whole match set => the epipolar
    # geometry is underdetermined by the data). Measured on the real
    # quasi-degenerate simulator pair 150->165 (.scratch/degensac_lab.py,
    # 08-19): that pair is NOT H-degenerate by either test (H explains
    # only ~100/245 E-inliers and GRIC_H > GRIC_E on every seed) — its
    # failure mode is count-TIED ambiguity, handled by ambiguity_blend
    # in geometry/ransac.py instead.
    sigma2 = (threshold_n / 2.0) ** 2
    d2_E = sampson_error_sq(E_best, pts1_n, pts2_n)
    d2_E = jnp.where(jnp.isfinite(d2_E), d2_E, 16.0 * sigma2)
    errh_all = homography_transfer_err_sq(H, pts1_n, pts2_n)
    d2_H = jnp.where(jnp.isfinite(errh_all), errh_all, 16.0 * sigma2)
    g_E = gric_score(d2_E, valid_mask, sigma2, d_dim=3.0, k_par=5.0)
    g_H = gric_score(d2_H, valid_mask, sigma2, d_dim=2.0, k_par=8.0)
    degen = (h_cnt.astype(jnp.float32)
             >= h_frac * num_inliers.astype(jnp.float32)) | (g_H < g_E)
    # Off-plane set: complement of H membership over ALL valid matches
    # (h_mask only covered the E-inliers), with a 2x threshold margin so
    # near-plane points — whose parallax lines are too short to pin the
    # epipole — don't pollute the pair sampling.
    dh = jnp.where(jnp.isfinite(errh_all), jnp.sqrt(errh_all), jnp.inf)
    off = valid_mask & (dh > 2.0 * threshold_n)
    n_off = jnp.sum(off.astype(jnp.int32))

    E_pp, ok_pp = plane_parallax_essentials(
        kPP, H, pts1_n, pts2_n, off, num_hypotheses=pp_hypotheses)

    d2 = sampson_error_sq(E_pp, pts1_n[None], pts2_n[None])   # (P, N)
    d2 = jnp.where(jnp.isfinite(d2), d2, thr2)
    inl = (d2 < thr2) & valid_mask[None, :] & ok_pp[:, None]
    cnt_off = jnp.sum((inl & off[None, :]).astype(jnp.int32), axis=-1)
    trunc_off = jnp.sum(jnp.minimum(d2, thr2) * off[None, :], axis=-1)
    rank = jnp.argsort(jnp.argsort(trunc_off))
    best = jnp.argmax(cnt_off * jnp.int32(pp_hypotheses)
                      - rank.astype(jnp.int32))

    d2_cur = sampson_error_sq(E_best, pts1_n, pts2_n)
    d2_cur = jnp.where(jnp.isfinite(d2_cur), d2_cur, thr2)
    cnt_off_cur = jnp.sum(((d2_cur < thr2) & off).astype(jnp.int32))

    # guards: a meaningless winner (tiny support) or a collapsed H fit
    # must never trigger the rescue
    use = (degen & (num_inliers >= 8) & (h_cnt >= 4)
           & (n_off >= min_offplane) & (cnt_off[best] > cnt_off_cur))
    E_out = jnp.where(use, E_pp[best], E_best)
    mask_out = jnp.where(use, inl[best], inlier_mask)
    return (E_out, mask_out, jnp.sum(mask_out.astype(jnp.int32)),
            use, h_cnt)
