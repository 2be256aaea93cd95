"""Pose recovery from an essential matrix (pure JAX, batched cheirality test).

Replaces `cv2.recoverPose(E, pts1, pts2, K)` (reference:
src/core/pose_estimator.py:533): decompose E into the four (R, t) candidates
and pick the one that places the most triangulated points in front of both
cameras. All four candidates are triangulated against all correspondences as
one batched tensor op — no per-candidate loop.

Conventions match OpenCV: x2 ~ R x1 + t maps camera-1 coordinates into
camera 2, t is unit-norm (scale is unobservable), and points farther than
`dist_thresh` (OpenCV default 50, in units of the unit baseline) do not
count toward cheirality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .epipolar import project_to_essential

_EPS = 1e-12


def decompose_essential(E):
    """E (..., 3, 3) -> (R1, R2, t) candidate factors (Hartley-Zisserman).

    R1 = U W Vt, R2 = U Wt Vt, t = third column of U (unit). The four pose
    candidates are (R1, +t), (R1, -t), (R2, +t), (R2, -t).
    """
    _, U, Vt = project_to_essential(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    # 3x3 HIGHEST matmuls: a bf16 pass here breaks R orthonormality at
    # 1e-3 when called outside the estimator's highest-precision scope
    _hi = jax.lax.Precision.HIGHEST
    R1 = jnp.matmul(U, jnp.matmul(W, Vt, precision=_hi), precision=_hi)
    R2 = jnp.matmul(U, jnp.matmul(W.T, Vt, precision=_hi), precision=_hi)
    t = U[..., :, 2]
    return R1, R2, t


def triangulate_depths(R, t, pts1_n, pts2_n):
    """Midpoint-method depths for points under pose (R, t).

    R: (..., 3, 3), t: (..., 3); pts: (N, 2) normalized coords (shared across
    the candidate batch). Returns (z1, z2): (..., N) depths in camera 1 and 2.

    Solves min_z || z1 * a - z2 * b + c || with a = x1_h, b = R^T x2_h,
    c = R^T t via the closed-form 2x2 normal equations (vectorized over both
    the candidate axis and the point axis).
    """
    x1 = jnp.concatenate([pts1_n, jnp.ones_like(pts1_n[..., :1])], axis=-1)  # (N, 3)
    x2 = jnp.concatenate([pts2_n, jnp.ones_like(pts2_n[..., :1])], axis=-1)
    a = jnp.broadcast_to(x1, (*R.shape[:-2], *x1.shape))           # (..., N, 3)
    b = jnp.einsum("...ji,nj->...ni", R, x2)                        # R^T x2
    c = jnp.einsum("...ji,...j->...i", R, t)[..., None, :]          # (..., 1, 3)

    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    ab = jnp.sum(a * b, axis=-1)
    ac = jnp.sum(a * c, axis=-1)
    bc = jnp.sum(b * c, axis=-1)
    det = aa * bb - ab * ab
    # [aa -ab; -ab bb] [z1; -z2] = [-ac; -bc]  =>  closed-form solve
    z1 = (-ac * bb + ab * bc) / (det + _EPS)
    z2 = (aa * bc - ab * ac) / (det + _EPS)
    return z1, z2


def cheirality_votes(E, pts1_n, pts2_n, valid_mask, dist_thresh=None):
    """Best cheirality vote count over E's four (R, t) candidates.

    Cheap scalar used to re-rank competing essential hypotheses inside
    RANSAC: every root of an exact minimal problem fits all sample points
    (zero Sampson error), and on low-parallax video pairs a "twisted-pair"
    E can fit nearly every correspondence — but only the true model
    reconstructs the points in FRONT of both cameras (the disambiguation
    cv2.recoverPose performs downstream, pose_estimator.py:522-533).

    dist_thresh=None (default) counts positive depths WITHOUT OpenCV's
    50-unit distance cap: on small-baseline pairs nearly all points sit
    beyond 50 baseline units, so the capped count is a handful of noisy
    votes while the uncapped sign-of-depth count separates true from
    twisted models by hundreds of votes (measured on salah pair 15->20:
    true E 464/476 uncapped inlier votes, twisted twins ~0).
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    z1, z2 = triangulate_depths(Rs, ts, pts1_n, pts2_n)
    good = (z1 > 0.0) & (z2 > 0.0) & valid_mask[None, :]
    if dist_thresh is not None:
        good = good & (z1 < dist_thresh) & (z2 < dist_thresh)
    return jnp.max(jnp.sum(good.astype(jnp.int32), axis=-1))


def recover_pose(E, pts1_n, pts2_n, valid_mask, dist_thresh=50.0,
                 inlier_mask=None):
    """Select the cheirality-consistent (R, t) from E's four candidates.

    Args:
      E: (3, 3) essential matrix.
      pts1_n, pts2_n: (N, 2) normalized coords of the matched points.
      valid_mask: (N,) bool — which correspondences participate (OpenCV's
        recoverPose in the reference call sees all matched points,
        pose_estimator.py:533; padding slots are masked out here).
      dist_thresh: max depth (units of the unit baseline) to count a point.
      inlier_mask: optional (N,) bool — the RANSAC inlier set. When given,
        candidates are ranked by cheirality votes over the INLIERS first,
        with all-match votes as the tie-break. The reference (like
        cv2.recoverPose without a mask) votes over all matched points,
        which lets the outlier majority elect the 180-degree-twin rotation:
        simulator pair 780->795 decomposes into R1 (111/286 all-match
        votes, 180 deg wrong, only 6/93 inlier votes) vs R2 (79 all-match
        votes but 13 inlier votes, 4.3 deg from GT) — the regime behind the
        reference's five catastrophic simulator pairs (golden CSV frames
        810-870). Voting on the model's own consensus set is strictly
        more reliable; documented deviation in PARITY.md.

    Returns (R, t, num_good, good_mask):
      R (3, 3), t (3,) unit norm, num_good int32 cheirality votes of the
      winner over all matched points (the reference-comparable count),
      good_mask (N,) bool — points in front of both cameras under the
      winning pose (the `mask_pose` analogue).
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)                  # (4, 3, 3)
    ts = jnp.stack([t, -t, t, -t], axis=0)                    # (4, 3)

    z1, z2 = triangulate_depths(Rs, ts, pts1_n, pts2_n)       # (4, N)
    pos = (z1 > 0.0) & (z2 > 0.0)
    front = pos & (z1 < dist_thresh) & (z2 < dist_thresh)
    good = front & valid_mask[None, :]
    votes = jnp.sum(good.astype(jnp.int32), axis=-1)          # (4,)
    if inlier_mask is None:
        score = votes
    else:
        # Primary: UNCAPPED positive-depth votes over the inlier set (see
        # cheirality_votes docstring — the 50-unit cap starves the vote on
        # small-baseline pairs). Secondary: the reference-comparable capped
        # all-match votes.
        n = pts1_n.shape[0]
        votes_inl = jnp.sum((pos & inlier_mask[None, :]).astype(jnp.int32),
                            axis=-1)
        score = votes_inl * jnp.int32(n + 1) + votes
    best = jnp.argmax(score)
    return Rs[best], ts[best], votes[best], good[best]
