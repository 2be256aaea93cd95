"""Custom batched small-matrix eigensolvers (TPU speed-of-light path).

XLA's generic `eigh` on TPU is an iterative QDWH/Jacobi routine that costs
~30 ms for the (2048, 9, 9) RANSAC batch — 90%+ of the whole pipeline's
runtime (measured). These replacements are branch-free unrolled elementwise
code that the VPU chews through in microseconds:

  * `eigh3x3_desc`:    closed-form trigonometric (Cardano) eigenvalues +
                       cross-product eigenvectors for symmetric 3x3.
  * `smallest_eigvec_sym`: unrolled Cholesky + inverse iteration for the
                       eigenvector of the smallest eigenvalue of a symmetric
                       PSD matrix (the 8-point DLT nullspace: A^T A has rank
                       8, so inverse iteration converges in 2-3 steps).

Both are fully batched over leading dimensions and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-20


def eigh3x3_desc(A):
    """Symmetric 3x3 eigendecomposition, descending eigenvalues.

    A: (..., 3, 3) symmetric. Returns (w (..., 3) descending,
    V (..., 3, 3) orthonormal columns, det(V) = +1).

    Eigenvalues by the trigonometric (Cardano) method; eigenvectors as the
    dominant cross product of rows of (A - lambda I) (rank-2 for distinct
    eigenvalues), with degenerate cases rescued by orthogonal completion.
    """
    A = jnp.asarray(A)
    a00 = A[..., 0, 0]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a11 = A[..., 1, 1]
    a12 = A[..., 1, 2]
    a22 = A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    # det(B/p) / 2
    ip = 1.0 / p
    c00, c11, c22 = b00 * ip, b11 * ip, b22 * ip
    c01, c02, c12 = a01 * ip, a02 * ip, a12 * ip
    r = 0.5 * (c00 * (c11 * c22 - c12 * c12)
               - c01 * (c01 * c22 - c12 * c02)
               + c02 * (c01 * c12 - c11 * c02))
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w0 = q + 2.0 * p * jnp.cos(phi)                       # largest
    w2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w0 - w2

    def eigvec(lam):
        # rows of (A - lam I)
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01_ = jnp.cross(r0, r1)
        c02_ = jnp.cross(r0, r2)
        c12_ = jnp.cross(r1, r2)
        n01 = jnp.sum(c01_ * c01_, axis=-1)
        n02 = jnp.sum(c02_ * c02_, axis=-1)
        n12 = jnp.sum(c12_ * c12_, axis=-1)
        # pick the largest cross product (most numerically stable)
        best12 = (n12 >= n01) & (n12 >= n02)
        best02 = (n02 >= n01) & ~best12
        v = jnp.where(best12[..., None], c12_,
                      jnp.where(best02[..., None], c02_, c01_))
        n = jnp.sqrt(jnp.maximum(
            jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
        return v / n

    # v2 (smallest) first: for essential matrices EtE has a *double* top
    # eigenvalue (sigma, sigma, 0), so the smallest is the well-separated,
    # numerically reliable one; v0 inside the near-degenerate top plane is
    # arbitrary and gets orthogonalized against v2 (any orthonormal basis of
    # that plane yields the same essential projection / pose candidates).
    v2 = eigvec(w2)
    v0 = eigvec(w0)
    v0 = v0 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v2
    n0 = jnp.sqrt(jnp.maximum(jnp.sum(v0 * v0, axis=-1, keepdims=True), _EPS))
    # fallback for degenerate v0: orthogonal completion from a fixed axis
    ref = jnp.zeros_like(v2).at[..., 0].set(1.0)
    alt = jnp.zeros_like(v2).at[..., 1].set(1.0)
    ref = jnp.where(jnp.abs(jnp.sum(v2 * ref, axis=-1, keepdims=True)) > 0.9,
                    alt, ref)
    fallback = ref - jnp.sum(v2 * ref, axis=-1, keepdims=True) * v2
    fallback = fallback / jnp.sqrt(jnp.maximum(
        jnp.sum(fallback * fallback, axis=-1, keepdims=True), _EPS))
    degenerate = n0[..., 0] < 1e-6
    v0 = jnp.where(degenerate[..., None], fallback, v0 / n0)
    v1 = jnp.cross(v2, v0)

    w = jnp.stack([w0, w1, w2], axis=-1)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V


def _cholesky_unrolled(A, n: int, jitter):
    """Unrolled dense Cholesky for small n; A (..., n, n) symmetric PD."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j] + (jitter if i == j else 0.0)
            for k_ in range(j):
                s = s - L[i][k_] * L[j][k_]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, _EPS))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_unrolled(L, b, n: int):
    """Solve L L^T x = b with unrolled triangular solves; b: list of (...,)."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k_ in range(i):
            s = s - L[i][k_] * y[k_]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k_ in range(i + 1, n):
            s = s - L[k_][i] * x[k_]
        x[i] = s / L[i][i]
    return x


def smallest_eigvec_sym(A, iters: int = 3):
    """Eigenvector of the smallest eigenvalue of symmetric PSD A (..., n, n).

    Shifted inverse iteration: factor (A + eps*tr*I) once with an unrolled
    Cholesky, then apply `iters` triangular solves. Exact for the 8-point
    nullspace problem (one tiny eigenvalue, well separated); degenerate
    inputs produce *a* null-space vector, which is the correct behavior for
    RANSAC (degenerate minimal samples lose the vote anyway).
    """
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    jitter = (1e-7 * tr + 1e-12)
    L = _cholesky_unrolled(A, n, jitter)

    # deterministic start vector; components over the whole space
    x = [jnp.full(A.shape[:-2], 1.0 + 0.01 * i, dtype=A.dtype)
         for i in range(n)]
    for _ in range(iters):
        x = _chol_solve_unrolled(L, x, n)
        nrm = jnp.sqrt(sum(xi * xi for xi in x) + _EPS)
        x = [xi / nrm for xi in x]
    return jnp.stack(x, axis=-1)
