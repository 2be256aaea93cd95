"""Essential-matrix estimation building blocks (pure JAX, fully batched).

TPU-native replacement for the linear algebra inside OpenCV's
`cv2.findEssentialMat` (reference: src/core/pose_estimator.py:522-527).
Instead of a sequential RANSAC loop around a minimal solver, every routine
here is written to run over a leading *hypothesis* batch axis so thousands
of candidate models are solved simultaneously on the MXU/VPU
(see SURVEY.md §2.3 "hypothesis-level parallelism").

All image points are pixel coordinates unless noted; `normalize_points`
moves them to normalized camera coordinates (K^-1 applied), which is where
the solvers and Sampson scoring operate (matching OpenCV, which normalizes
by K and rescales the pixel threshold by the mean focal length).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def normalize_points(pts, K):
    """Pixel coords (..., N, 2) -> normalized camera coords via K^-1.

    K is (3, 3) (fx, fy, cx, cy, possibly skew=0). Uses the closed form
    instead of a matrix solve.
    """
    fx = K[0, 0]
    fy = K[1, 1]
    cx = K[0, 2]
    cy = K[1, 2]
    x = (pts[..., 0] - cx) / fx
    y = (pts[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def _build_epipolar_rows(pts1, pts2):
    """Rows of the DLT system: a_i . e = 0 with e = vec(E) (row-major).

    For x2^T E x1 = 0 with x = (x, y, 1):
    row = [x2*x1, x2*y1, x2, y2*x1, y2*y1, y2, x1, y1, 1].
    pts: (..., N, 2) normalized coords. Returns (..., N, 9).
    """
    x1, y1 = pts1[..., 0], pts1[..., 1]
    x2, y2 = pts2[..., 0], pts2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )


def eight_point(pts1, pts2, weights=None):
    """Weighted 8-point (or n-point least-squares) essential matrix.

    pts1, pts2: (..., N, 2) normalized camera coords (N >= 8).
    weights:    (..., N) nonnegative; zeros drop points (used both for the
                minimal 8-of-N sampling mask and for inlier refits).

    Returns E (..., 3, 3) with ||E||_F = 1 (sign unconstrained), *not yet*
    projected to the essential manifold — use `project_to_essential`.

    Solved as the eigenvector of A^T W A for the smallest eigenvalue; the
    9x9 symmetric eigendecomposition batches onto TPU cleanly (XLA eigh),
    unlike a tall-skinny SVD per hypothesis.

    No explicit Hartley rescaling is performed: the K^-1 normalization
    already centers points near the origin at ~unit scale, which is the
    conditioning Hartley rescaling provides for pixel coordinates.
    """
    from .eig import smallest_eigvec_sym

    A = _build_epipolar_rows(pts1, pts2)  # (..., N, 9)
    if weights is not None:
        A = A * weights[..., None]
    # Normal matrix, (..., 9, 9). f32 is adequate after K-normalization.
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    # Custom Cholesky inverse iteration — XLA's batched eigh on TPU costs
    # ~30 ms for the 2048-hypothesis batch; this is ~1000x cheaper.
    e = smallest_eigvec_sym(AtA)
    E = e.reshape(*e.shape[:-1], 3, 3)
    return E


def project_to_essential(E):
    """Project E onto the essential manifold: singular values -> (1, 1, 0).

    Uses the eigendecomposition of E^T E (3x3 symmetric) instead of a general
    SVD: V from eigh, U = E V / sigma, with the null column completed by a
    cross product. Returns (E_proj, U, Vt) where U, Vt are proper rotations
    (det = +1) and E_proj = U @ diag(1, 1, 0) @ Vt.
    """
    from .eig import eigh3x3_desc

    EtE = jnp.matmul(jnp.swapaxes(E, -1, -2), E)
    # Closed-form symmetric 3x3 eigendecomposition (descending, orthonormal
    # V with det +1) — avoids XLA's slow batched eigh on TPU.
    evals, V = eigh3x3_desc(EtE)
    s = jnp.sqrt(jnp.clip(evals, 0.0, None))  # (..., 3) descending
    u0 = jnp.matmul(E, V[..., :, 0:1])[..., 0] / (s[..., 0:1] + _EPS)
    u1 = jnp.matmul(E, V[..., :, 1:2])[..., 0] / (s[..., 1:2] + _EPS)
    u0 = u0 / (jnp.linalg.norm(u0, axis=-1, keepdims=True) + _EPS)
    # Gram-Schmidt to guard near-equal singular values.
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / (jnp.linalg.norm(u1, axis=-1, keepdims=True) + _EPS)
    u2 = jnp.cross(u0, u1)
    U = jnp.stack([u0, u1, u2], axis=-1)

    def _det3(M):
        # closed form — jnp.linalg.det lowers to batched LU, which is slow
        # for thousands of tiny matrices on TPU
        return (M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2]
                                - M[..., 1, 2] * M[..., 2, 1])
                - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2]
                                  - M[..., 1, 2] * M[..., 2, 0])
                + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1]
                                  - M[..., 1, 1] * M[..., 2, 0]))

    # Make U, V proper rotations (flip last column if det < 0).
    U = U.at[..., :, 2].multiply(jnp.sign(_det3(U))[..., None])
    V = V.at[..., :, 2].multiply(jnp.sign(_det3(V))[..., None])
    Vt = jnp.swapaxes(V, -1, -2)
    D = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    E_proj = jnp.matmul(U, jnp.matmul(D, Vt))
    return E_proj, U, Vt


def sampson_error_sq(E, pts1, pts2):
    """Squared Sampson distance of each correspondence to the epipolar model.

    E: (..., 3, 3); pts: (..., N, 2) normalized coords. Returns (..., N).
    This is the same residual OpenCV's essential-matrix RANSAC thresholds
    (threshold given in pixels is divided by the mean focal length before
    comparison — see `ransac.py`).
    """
    # Layout note: an einsum producing (..., N, 3) puts the 3-vector in the
    # lane dimension, which pads 3 -> 128 on TPU (~42x wasted HBM traffic at
    # RANSAC scale, measured 0.61 ms/pair of the round-2 stage budget).
    # Expanding E into nine scalar coefficients keeps every intermediate at
    # (..., N) with N in lanes; XLA fuses the whole body into one pass.
    u1, v1 = pts1[..., 0], pts1[..., 1]             # (..., N)
    u2, v2 = pts2[..., 0], pts2[..., 1]

    def e(i, j):
        return E[..., i, j][..., None]              # (..., 1) vs (..., N)

    # Ex1_i = E[i,0] u1 + E[i,1] v1 + E[i,2]; Etx2_j = E[0,j] u2 + ...
    Ex1_0 = e(0, 0) * u1 + e(0, 1) * v1 + e(0, 2)
    Ex1_1 = e(1, 0) * u1 + e(1, 1) * v1 + e(1, 2)
    Ex1_2 = e(2, 0) * u1 + e(2, 1) * v1 + e(2, 2)
    Etx2_0 = e(0, 0) * u2 + e(1, 0) * v2 + e(2, 0)
    Etx2_1 = e(0, 1) * u2 + e(1, 1) * v2 + e(2, 1)
    x2tEx1 = u2 * Ex1_0 + v2 * Ex1_1 + Ex1_2        # (..., N)
    denom = Ex1_0 ** 2 + Ex1_1 ** 2 + Etx2_0 ** 2 + Etx2_1 ** 2
    return (x2tEx1 ** 2) / (denom + _EPS)
