"""Custom batched eigensolvers vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from rpe_tpu.geometry.eig import eigh3x3_desc, smallest_eigvec_sym


def _rand_sym3(rng, n):
    M = rng.normal(size=(n, 3, 3))
    return (M + M.transpose(0, 2, 1)) / 2


def test_eigh3x3_eigenvalues(rng):
    A = _rand_sym3(rng, 64).astype(np.float32)
    w, V = eigh3x3_desc(jnp.asarray(A))
    w = np.asarray(w)
    for i in range(64):
        ref = np.sort(np.linalg.eigvalsh(A[i]))[::-1]
        np.testing.assert_allclose(w[i], ref, atol=2e-4 * max(1, abs(ref).max()))


def test_eigh3x3_eigenvectors(rng):
    A = _rand_sym3(rng, 64).astype(np.float32)
    w, V = eigh3x3_desc(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    for i in range(64):
        # A v = lambda v for each column
        for k in range(3):
            r = A[i] @ V[i][:, k] - w[i][k] * V[i][:, k]
            assert np.linalg.norm(r) < 5e-3 * max(1, np.abs(w[i]).max())
        np.testing.assert_allclose(V[i].T @ V[i], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(V[i]), 1.0, atol=1e-5)


def test_eigh3x3_essential_structure(rng):
    """The essential case: eigenvalues (s, s, 0) — double top eigenvalue."""
    for i in range(20):
        # build E = U diag(1,1,0) V^T
        U = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        Vt = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        E = U @ np.diag([1.0, 1.0, 0.0]) @ Vt
        EtE = (E.T @ E).astype(np.float32)
        w, V = eigh3x3_desc(jnp.asarray(EtE[None]))
        w, V = np.asarray(w)[0], np.asarray(V)[0]
        np.testing.assert_allclose(w, [1.0, 1.0, 0.0], atol=5e-4)
        # smallest eigenvector must align with the true null direction
        null = Vt.T[:, 2]
        assert abs(V[:, 2] @ null) > 0.9999
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-5)


def test_smallest_eigvec_9x9_nullspace(rng):
    """Rank-8 A^T A (the 8-point case): recover the null vector."""
    for i in range(10):
        B = rng.normal(size=(8, 9)).astype(np.float32)
        AtA = B.T @ B  # rank 8
        v = np.asarray(smallest_eigvec_sym(jnp.asarray(AtA[None])))[0]
        # residual in the quotient: A v should be ~0 relative to |A|
        res = np.linalg.norm(B @ v) / np.linalg.norm(B)
        assert res < 1e-3, res
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)


def test_smallest_eigvec_batched_matches_numpy(rng):
    A = rng.normal(size=(32, 6, 9)).astype(np.float32)
    AtA = np.einsum("bni,bnj->bij", A, A)  # rank 6 -> 3-dim nullspace
    v = np.asarray(smallest_eigvec_sym(jnp.asarray(AtA)))
    for i in range(32):
        # v must lie in the (3-dim) nullspace: AtA v ~ 0
        r = np.linalg.norm(AtA[i] @ v[i]) / np.linalg.norm(AtA[i])
        assert r < 1e-3
