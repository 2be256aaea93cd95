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

Mitigation: detect the tie (count-tied, deduplicated candidates whose
mutual rotation diameter exceeds `diam_deg`) and return the
count^2-weighted CHORDAL MEAN of the tied set — the posterior mean over
a flat likelihood — instead of an arbitrary valley endpoint. Measured
(12 seeds, grid over margin/weights in .scratch/blend_lab.py): pair
150->165 worst seed 8.01 -> 4.51 deg, mean 2.35 -> 3.37; ambiguous
control 690->705 worst 4.51 -> 3.26; clean pairs (0->15, 300->315,
600->615) fire rarely and move < 0.1 deg.

Everything is fixed-shape and jittable: the blend is always computed and
selected with jnp.where.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .epipolar import project_to_essential, sampson_error_sq

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
                    num_inliers, *, topk: int = 16, margin: float = 0.08,
                    dedupe_deg: float = 0.5, diam_deg: float = 2.5):
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
    cnt_top = counts[top_idx].astype(jnp.float32)         # (k,)
    R_top, t_top, _, _ = jax.vmap(
        lambda Ei, mi: recover_pose(Ei, pts1_n, pts2_n, valid_mask,
                                    inlier_mask=mi)
    )(E_top, inliers_h[top_idx])

    # tie set: counts within `margin` of the best (top_k is score-sorted)
    tied = cnt_top >= (1.0 - margin) * cnt_top[0]
    # dedupe: drop i when a better-ranked tied j sits within dedupe_deg
    ang = _rot_angle_deg(R_top[:, None], R_top[None])     # (k, k)
    better = (jnp.arange(k)[None, :] < jnp.arange(k)[:, None])
    dup = jnp.any(better & tied[None, :] & (ang < dedupe_deg), axis=1)
    keep = tied & ~dup
    n_keep = jnp.sum(keep.astype(jnp.int32))

    pair_keep = keep[:, None] & keep[None, :]
    diam = jnp.max(jnp.where(pair_keep, ang, 0.0))

    w = jnp.where(keep, cnt_top * cnt_top, 0.0)
    w = w / (jnp.sum(w) + _EPS)
    R_b = _polar_rotation(jnp.einsum("i,iab->ab", w, R_top))
    # translation: sign-align to the best candidate, then weighted mean
    sgn = jnp.sign(jnp.einsum("ia,a->i", t_top, t_top[0]) + _EPS)
    t_b = jnp.einsum("i,ia->a", w * sgn, t_top)
    t_norm = jnp.linalg.norm(t_b)
    t_ok = t_norm > 1e-6
    t_b = jnp.where(t_ok, t_b / (t_norm + _EPS), t_top[0])

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
