"""Count-tie ambiguity detection + rotation blending for RANSAC winners.

Failure mode (measured on the real simulator pair 150->165,
.scratch/{degensac,rank,cluster,reproj,blend}_lab.py, 08-19): on
transition pairs mixing small rotation with translation over structured
scenes, several essential matrices 4-8 deg apart in rotation explain
statistically indistinguishable inlier sets — counts within ~4%, equal
fine-threshold counts, equal uncapped cheirality, overlapping off-plane
support, and (decisively) exact triangulation+reprojection scoring ALSO
ties, with the wrong family sometimes denser in model space than the
true one. No per-candidate image-resident criterion separates them; the
likelihood valley is flat, and plain count selection draws a lottery
(0.35-8.0 deg across 12 RANSAC seeds on that pair; the reference's
cv2.findEssentialMat, reference src/core/pose_estimator.py:522-527,
draws the same lottery and happened to score 5.77).

Mitigation: REFIT the score-top candidates on their own inlier sets
(two least-squares rounds — collapses same-model minimal-sample noise so
clean pairs cannot fake a tie; v2, round 4), then detect the tie
(refit-count-tied, deduplicated candidates whose mutual rotation
diameter exceeds `diam_deg`) and return the count^2-weighted CHORDAL
MEAN of the tied set — the posterior mean over a flat likelihood —
instead of an arbitrary valley endpoint. Measured (12 seeds,
.scratch/regress_lab.py at margin 0.05 / diam 3.0): ambiguous pairs
150->165 worst seed 8.01 -> 4.62 (mean 2.35 -> 2.50), 195->210 worst
14.31 -> 4.80 (mean 5.37 -> 3.66), 765->780 worst 1.61 -> 1.47; clean
pairs 615->630 bit-identical, 165->180 mean 0.24 -> 0.29 (one seed
fires at 1.46 — the residual cost of bounding the ambiguous worst
case).

Everything is fixed-shape and jittable: the blend is always computed and
selected with jnp.where.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .epipolar import eight_point, project_to_essential, sampson_error_sq

_EPS = 1e-12


def _polar_rotation(M, iters: int = 12):
    """Nearest rotation to M (3, 3) via Newton polar iteration.

    X <- (X + X^-T)/2 converges quadratically to the orthogonal polar
    factor for near-orthogonal M — always the case here (M is a convex
    combination of rotations with diameter <~ 10 deg). Batched 3x3
    inverses stay on the fast path (no XLA SVD/eigh — CLAUDE.md perf
    rule); det(M) > 0 for small-diameter blends so the factor is a
    proper rotation.
    """
    X = M
    for _ in range(iters):
        Xinv_t = jnp.swapaxes(jnp.linalg.inv(X), -1, -2)
        X = 0.5 * (X + Xinv_t)
    return X


def _rot_angle_deg(Ri, Rj):
    """Geodesic angle (deg) between rotation matrices (..., 3, 3)."""
    tr = jnp.einsum("...ab,...ab->...", Ri, Rj)
    return jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def ambiguity_blend(E_h, score, counts, inliers_h, pts1_n, pts2_n,
                    valid_mask, threshold_n, E_best, inlier_mask,
                    num_inliers, *, topk: int = 16, margin: float = 0.05,
                    dedupe_deg: float = 0.5, diam_deg: float = 3.0):
    """Detect a count-tied, rotation-spread winner set; blend if found.

    Args mirror ransac_essential internals: E_h (H, 3, 3) hypothesis
    batch, score (H,) the selection key (count-major), counts (H,) int32,
    inliers_h (H, N) bool, plus the current winner (E_best, inlier_mask,
    num_inliers) to fall back to.

    Returns (E, inlier_mask, num_inliers, fired).
    """
    from .recover_pose import recover_pose

    k = min(topk, int(E_h.shape[0]))
    _, top_idx = jax.lax.top_k(score, k)
    E_top = E_h[top_idx]                                  # (k, 3, 3)
    m_top = inliers_h[top_idx]                            # (k, N)
    thr2_r = threshold_n * threshold_n

    # REFIT each tied candidate before judging the tie (v2, round 4): raw
    # minimal 5pt models carry sample noise, so on a CLEAN pair the
    # score-top candidates can spread > diam_deg while all describing the
    # same model — the v1 gate then replaced an excellent refit winner
    # with their mean (measured: sim 165->180 mean 0.24 -> 0.38, 615->630
    # 0.21 -> 0.41 across 12 seeds, .scratch/regress_lab.py). Two
    # least-squares rounds collapse same-model candidates onto each other
    # (dedupe then leaves one and the blend cannot fire), while on a
    # genuinely ambiguous pair the families refit to their own optima and
    # the tie/diameter survives (165: worst 8.01 -> 4.51 stays; 195->210:
    # mean 5.37 -> 3.27 stays).
    def _refit_pool(EM, _):
        E_c, m_c = EM
        w = m_c.astype(pts1_n.dtype)                      # (k, N)
        enough = jnp.sum(m_c.astype(jnp.int32), axis=1) >= 8
        E_new = jax.vmap(lambda wi: eight_point(pts1_n, pts2_n,
                                                weights=wi))(w)
        E_new, _, _ = jax.vmap(project_to_essential)(E_new)
        d2 = jax.vmap(lambda Ei: sampson_error_sq(Ei, pts1_n,
                                                  pts2_n))(E_new)
        m_new = (d2 < thr2_r) & valid_mask[None, :]
        better = (jnp.sum(m_new.astype(jnp.int32), axis=1)
                  >= jnp.sum(m_c.astype(jnp.int32), axis=1))
        take = enough & better
        E_o = jnp.where(take[:, None, None], E_new, E_c)
        m_o = jnp.where(take[:, None], m_new, m_c)
        return (E_o, m_o), None

    (E_top, m_top), _ = jax.lax.scan(_refit_pool, (E_top, m_top), None,
                                     length=2)
    cnt_top = jnp.sum(m_top.astype(jnp.int32), axis=1).astype(jnp.float32)
    R_top, t_top, _, _ = jax.vmap(
        lambda Ei, mi: recover_pose(Ei, pts1_n, pts2_n, valid_mask,
                                    inlier_mask=mi)
    )(E_top, m_top)

    # tie set: refit counts within `margin` of the pool's best
    tied = cnt_top >= (1.0 - margin) * jnp.max(cnt_top)
    # dedupe: drop i when a better tied j sits within dedupe_deg ("better"
    # = higher refit count, earlier pool index breaking exact ties — the
    # pre-refit score order no longer ranks the refit models)
    ang = _rot_angle_deg(R_top[:, None], R_top[None])     # (k, k)
    idx = jnp.arange(k)
    better = (cnt_top[None, :] > cnt_top[:, None]) | (
        (cnt_top[None, :] == cnt_top[:, None]) & (idx[None, :] < idx[:, None]))
    dup = jnp.any(better & tied[None, :] & (ang < dedupe_deg), axis=1)
    keep = tied & ~dup
    n_keep = jnp.sum(keep.astype(jnp.int32))

    pair_keep = keep[:, None] & keep[None, :]
    diam = jnp.max(jnp.where(pair_keep, ang, 0.0))

    w = jnp.where(keep, cnt_top * cnt_top, 0.0)
    w = w / (jnp.sum(w) + _EPS)
    R_b = _polar_rotation(jnp.einsum("i,iab->ab", w, R_top))
    # translation: sign-align to the highest-weight kept candidate, then
    # weighted mean
    ref = jnp.argmax(w)
    t_ref = jnp.take(t_top, ref, axis=0)
    sgn = jnp.sign(jnp.einsum("ia,a->i", t_top, t_ref) + _EPS)
    t_b = jnp.einsum("i,ia->a", w * sgn, t_top)
    t_norm = jnp.linalg.norm(t_b)
    t_ok = t_norm > 1e-6
    t_b = jnp.where(t_ok, t_b / (t_norm + _EPS), t_ref)

    tx = jnp.array([
        [0.0, -t_b[2], t_b[1]],
        [t_b[2], 0.0, -t_b[0]],
        [-t_b[1], t_b[0], 0.0],
    ], dtype=E_best.dtype)
    E_b = jnp.matmul(tx, R_b.astype(E_best.dtype),
                     precision=jax.lax.Precision.HIGHEST)
    E_b, _, _ = project_to_essential(E_b)

    thr2 = threshold_n * threshold_n
    d2_b = sampson_error_sq(E_b, pts1_n, pts2_n)
    d2_b = jnp.where(jnp.isfinite(d2_b), d2_b, thr2)
    mask_b = (d2_b < thr2) & valid_mask
    n_b = jnp.sum(mask_b.astype(jnp.int32))

    fired = ((n_keep >= 2) & (diam > diam_deg) & (num_inliers >= 8)
             & (n_b >= 5) & jnp.isfinite(E_b).all())
    E_out = jnp.where(fired, E_b, E_best)
    mask_out = jnp.where(fired, mask_b, inlier_mask)
    n_out = jnp.where(fired, n_b, num_inliers)
    return E_out, mask_out, n_out, fired
