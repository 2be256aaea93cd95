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
    R1 = jnp.matmul(U, jnp.matmul(W, Vt))
    R2 = jnp.matmul(U, jnp.matmul(W.T, Vt))
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


def cheirality_votes(E, pts1_n, pts2_n, valid_mask, dist_thresh=50.0):
    """Best cheirality vote count over E's four (R, t) candidates.

    Cheap scalar used to re-rank competing essential hypotheses inside
    RANSAC: every root of an exact minimal problem fits all sample points
    (zero Sampson error), but only the true model reconstructs the points
    in FRONT of both cameras — the disambiguation cv2.recoverPose performs
    after cv2.findEssentialMat in the reference (pose_estimator.py:522-533).
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    z1, z2 = triangulate_depths(Rs, ts, pts1_n, pts2_n)
    good = (
        (z1 > 0.0) & (z2 > 0.0)
        & (z1 < dist_thresh) & (z2 < dist_thresh)
        & valid_mask[None, :]
    )
    return jnp.max(jnp.sum(good.astype(jnp.int32), axis=-1))


def recover_pose(E, pts1_n, pts2_n, valid_mask, dist_thresh=50.0):
    """Select the cheirality-consistent (R, t) from E's four candidates.

    Args:
      E: (3, 3) essential matrix.
      pts1_n, pts2_n: (N, 2) normalized coords of the matched points.
      valid_mask: (N,) bool — which correspondences participate (OpenCV's
        recoverPose in the reference call sees all matched points,
        pose_estimator.py:533; padding slots are masked out here).
      dist_thresh: max depth (units of the unit baseline) to count a point.

    Returns (R, t, num_good, good_mask):
      R (3, 3), t (3,) unit norm, num_good int32 cheirality votes of the
      winner, good_mask (N,) bool — points in front of both cameras under
      the winning pose (the `mask_pose` analogue).
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)                  # (4, 3, 3)
    ts = jnp.stack([t, -t, t, -t], axis=0)                    # (4, 3)

    z1, z2 = triangulate_depths(Rs, ts, pts1_n, pts2_n)       # (4, N)
    good = (
        (z1 > 0.0) & (z2 > 0.0)
        & (z1 < dist_thresh) & (z2 < dist_thresh)
        & valid_mask[None, :]
    )
    votes = jnp.sum(good.astype(jnp.int32), axis=-1)          # (4,)
    best = jnp.argmax(votes)
    return Rs[best], ts[best], votes[best], good[best]
