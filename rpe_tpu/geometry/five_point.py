"""Batched 5-point (Nister) essential-matrix minimal solver — TPU-first.

Replaces the 5-point solver inside `cv2.findEssentialMat` (reference:
src/core/pose_estimator.py:522-527) with a formulation chosen for TPU
execution (SURVEY.md §7 "hard parts"): the hidden-variable resultant of
Li & Hartley ("Five-Point Motion Estimation Made Easy", ICPR 2006):

  1. nullspace of the 5x9 epipolar system via unrolled Householder QR
     -> E(x, y, z) = x X + y Y + z Z + W;
  2. the ten cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
     are expanded NUMERICALLY over the 20-monomial basis of degree <= 3 —
     polynomial products are einsums against precomputed static
     multiplication tables, so no hand-derived symbolic coefficient tables;
  3. hiding z: the system becomes M(z) m(x, y) = 0 with M a 10x10 matrix
     polynomial and m the vector of 10 (x, y)-monomials; solutions require
     det M(z) = 0;
  4. real roots of det M(z): evaluate the determinant directly (batched
     unrolled LU with partial pivoting) on a tan-spaced grid covering the
     whole real line, then bisect every sign change — no polynomial
     coefficient extraction, no companion-matrix eigenvalues, fully
     vectorized and branch-free;
  5. per root: null vector of M(z*) (via M^T M smallest-eigenvector inverse
     iteration) -> (x, y) -> E candidate.

Every step is fixed-shape batched math (LU/QR unrolled over tiny static
dims), so thousands of minimal samples solve simultaneously on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-20

GRID = 97           # tan-spaced determinant evaluation points
MAX_ROOTS = 10      # degree bound of the hidden-variable determinant
BISECT_ITERS = 10   # coarse root isolation only — the Gauss-Newton polish
# on the full cubic system does the final convergence


# ---------------------------------------------------------------------------
# Static monomial algebra tables (numpy, computed once at import)
# ---------------------------------------------------------------------------

def _monomials(max_deg):
    """All (a, b, c) with a+b+c <= max_deg for variables (x, y, z),
    deterministic order."""
    out = []
    for total in range(max_deg, -1, -1):
        for a in range(total, -1, -1):
            for b in range(total - a, -1, -1):
                c = total - a - b
                out.append((a, b, c))
    return out


_M1 = _monomials(1)      # 4:  [x, y, z, 1]
_M2 = _monomials(2)      # 10
_M3 = _monomials(3)      # 20
_M1_IDX = {m: i for i, m in enumerate(_M1)}
_M2_IDX = {m: i for i, m in enumerate(_M2)}
_M3_IDX = {m: i for i, m in enumerate(_M3)}


@functools.lru_cache(maxsize=None)
def _mul_tables():
    """T1[(4,4,10)]: deg1*deg1 -> deg2;  T2[(10,4,20)]: deg2*deg1 -> deg3."""
    T1 = np.zeros((4, 4, 10), dtype=np.float32)
    for i, (a1, b1, c1) in enumerate(_M1):
        for j, (a2, b2, c2) in enumerate(_M1):
            T1[i, j, _M2_IDX[(a1 + a2, b1 + b2, c1 + c2)]] = 1.0
    T2 = np.zeros((10, 4, 20), dtype=np.float32)
    for i, (a1, b1, c1) in enumerate(_M2):
        for j, (a2, b2, c2) in enumerate(_M1):
            T2[i, j, _M3_IDX[(a1 + a2, b1 + b2, c1 + c2)]] = 1.0
    return T1, T2


# (x, y)-monomial groups for the hidden-variable matrix: 10 groups in a
# fixed order; each deg-3 monomial (a, b, c) maps to group (a, b) and
# z-power c.
_XY_GROUPS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
              (1, 0), (0, 1), (0, 0)]
_XY_IDX = {g: i for i, g in enumerate(_XY_GROUPS)}


@functools.lru_cache(maxsize=None)
def _deriv_tables():
    """D[(3, 20, 20)]: d(mono_m)/d(var v) = D[v, m, m'] * mono_m'."""
    D = np.zeros((3, 20, 20), dtype=np.float32)
    for m, (a, b, c) in enumerate(_M3):
        if a > 0:
            D[0, m, _M3_IDX[(a - 1, b, c)]] = a
        if b > 0:
            D[1, m, _M3_IDX[(a, b - 1, c)]] = b
        if c > 0:
            D[2, m, _M3_IDX[(a, b, c - 1)]] = c
    return D


def _monos3(x, y, z):
    """Evaluate the 20 deg<=3 monomials at (x, y, z); stacked last axis."""
    vals = []
    for (a, b, c) in _M3:
        vals.append((x ** a) * (y ** b) * (z ** c))
    return jnp.stack(vals, axis=-1)


def _gn_refine(coeffs, x, y, z, iters: int = 4):
    """Gauss-Newton on the 10 cubic constraints over (x, y, z).

    coeffs: (..., 10, 20); x, y, z: (...,). Polishes the hidden-variable
    extraction to f32 machine precision (the nullvector route alone squares
    the conditioning via M^T M).
    """
    D = jnp.asarray(_deriv_tables())

    def step(carry, _):
        x, y, z = carry
        m = _monos3(x, y, z)                            # (..., 20)
        r = jnp.einsum("...em,...m->...e", coeffs, m)   # (..., 10)
        dm = jnp.einsum("vmn,...n->...vm", D, m)        # (..., 3, 20)
        J = jnp.einsum("...em,...vm->...ev", coeffs, dm)  # (..., 10, 3)
        JtJ = jnp.einsum("...ev,...ew->...vw", J, J)
        Jtr = jnp.einsum("...ev,...e->...v", J, r)
        JtJ = JtJ + 1e-12 * jnp.eye(3, dtype=JtJ.dtype)
        # closed-form 3x3 solve (adjugate)
        a, b_, c = JtJ[..., 0, 0], JtJ[..., 0, 1], JtJ[..., 0, 2]
        e, f = JtJ[..., 1, 1], JtJ[..., 1, 2]
        i_ = JtJ[..., 2, 2]
        det = (a * (e * i_ - f * f) - b_ * (b_ * i_ - f * c)
               + c * (b_ * f - e * c))
        det = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        gx, gy, gz = Jtr[..., 0], Jtr[..., 1], Jtr[..., 2]
        dx = -((e * i_ - f * f) * gx + (c * f - b_ * i_) * gy
               + (b_ * f - c * e) * gz) / det
        dy = -((c * f - b_ * i_) * gx + (a * i_ - c * c) * gy
               + (c * b_ - a * f) * gz) / det
        dz = -((b_ * f - c * e) * gx + (c * b_ - a * f) * gy
               + (a * e - b_ * b_) * gz) / det
        return (x + dx, y + dy, z + dz), None

    (x, y, z), _ = jax.lax.scan(step, (x, y, z), None, length=iters)
    return x, y, z


@functools.lru_cache(maxsize=None)
def _hidden_var_table():
    """S[(20, 10, 4)]: deg3-monomial -> (xy-group, z-power) scatter."""
    S = np.zeros((20, 10, 4), dtype=np.float32)
    for m, (a, b, c) in enumerate(_M3):
        S[m, _XY_IDX[(a, b)], c] = 1.0
    return S


@functools.lru_cache(maxsize=None)
def _flip_table():
    """P[(20, 20)]: coefficient permutation for the projective chart flip.

    The constraints are homogeneous cubics in (x, y, z, w) with E = xX + yY
    + zZ + wW; the solver works in the affine chart w=1. Substituting
    (x, y, z) = (u/w', v/w', 1/w') and multiplying by w'^3 maps the
    coefficient of monomial x^a y^b z^c to that of u^a v^b w'^(3-a-b-c) —
    the SAME 20 coefficients with the z-degree reversed. Used to re-extract
    large-|z| roots in the chart where they are well-conditioned.
    """
    P = np.zeros((20, 20), dtype=np.float32)
    for m, (a, b, c) in enumerate(_M3):
        P[m, _M3_IDX[(a, b, 3 - a - b - c)]] = 1.0
    return P


# ---------------------------------------------------------------------------
# Unrolled small linear algebra
# ---------------------------------------------------------------------------

def _householder_null4(A):
    """Orthonormal 4-dim nullspace of A (..., 5, 9) via QR of A^T.

    Returns (..., 9, 4). Unrolled Householder (5 reflectors on the 9x5
    matrix A^T); the last 4 columns of the accumulated Q span null(A).
    """
    At = jnp.swapaxes(A, -1, -2)                    # (..., 9, 5)
    batch = At.shape[:-2]
    Q = jnp.broadcast_to(jnp.eye(9, dtype=At.dtype), (*batch, 9, 9))
    R = At
    for k_ in range(5):
        x = R[..., k_:, k_]                          # (..., 9-k)
        normx = jnp.sqrt(jnp.sum(x * x, axis=-1) + _EPS)
        sign = jnp.where(x[..., 0] >= 0, 1.0, -1.0)
        v = x.at[..., 0].add(sign * normx)
        vnorm2 = jnp.sum(v * v, axis=-1, keepdims=True) + _EPS
        # apply H = I - 2 v v^T / (v^T v) to R[k:, k:] and Q[:, k:]
        vR = jnp.einsum("...i,...ij->...j", v, R[..., k_:, k_:])
        R = R.at[..., k_:, k_:].add(
            -2.0 * v[..., :, None] * vR[..., None, :] / vnorm2[..., None])
        Qv = jnp.einsum("...ij,...j->...i", Q[..., :, k_:], v)
        Q = Q.at[..., :, k_:].add(
            -2.0 * Qv[..., :, None] * v[..., None, :] / vnorm2[..., None])
    return Q[..., :, 5:]                             # (..., 9, 4)


def _det10_lu(M, pivot: bool = False):
    """Determinant of (..., 10, 10) via unrolled LU.

    pivot=False (default): no row pivoting. The hidden-variable matrices are
    row-normalized upstream and generically well-pivoted; the occasional
    ill-conditioned evaluation merely perturbs one grid sample of the sign
    scan, and spurious roots are eliminated by the Gauss-Newton polish +
    RANSAC scoring. Pivoting needs take_along_axis — a TPU gather that
    dominated the whole solver (~10x slowdown across the ~70k determinant
    evaluations per RANSAC call).
    """
    n = 10
    det = jnp.ones(M.shape[:-2], dtype=M.dtype)
    A = M
    for k_ in range(n - 1):
        if pivot:
            col = jnp.abs(A[..., k_:, k_])           # (..., n-k)
            p = jnp.argmax(col, axis=-1)             # relative pivot row
            kp = (k_ + p)[..., None]                 # (..., 1)
            idx = jnp.arange(n)                      # (n,)
            rows = jnp.where(idx == k_, kp,
                             jnp.where(idx == kp, k_, idx))
            A = jnp.take_along_axis(A, rows[..., :, None], axis=-2)
            det = det * jnp.where(p == 0, 1.0, -1.0)
        piv = A[..., k_, k_]
        det = det * piv
        safe = jnp.where(jnp.abs(piv) > _EPS, piv, 1.0)
        factor = A[..., k_ + 1:, k_] / safe[..., None]
        A = A.at[..., k_ + 1:, k_:].add(
            -factor[..., :, None] * A[..., k_, k_:][..., None, :])
    det = det * A[..., n - 1, n - 1]
    return det


# ---------------------------------------------------------------------------
# Polynomial system construction
# ---------------------------------------------------------------------------

def _build_constraint_coeffs(null4):
    """null4 (..., 9, 4) -> coefficient matrix (..., 10, 20).

    Rows: [det E] + 9 entries of 2 E E^T E - tr(E E^T) E; columns: the 20
    monomials of (x, y, z) with degree <= 3 (order _M3).
    """
    T1, T2 = (jnp.asarray(t) for t in _mul_tables())
    # E entries as deg-1 polynomials: (..., 3, 3, 4)
    Ep = null4.reshape(*null4.shape[:-2], 3, 3, 4)

    def mul11(p, q):  # deg1 x deg1 -> deg2
        return jnp.einsum("...a,...b,abm->...m", p, q, T1)

    def mul21(p, q):  # deg2 x deg1 -> deg3
        return jnp.einsum("...a,...b,abm->...m", p, q, T2)

    # det E (Laplace expansion along row 0)
    def minor(r0, r1, c0, c1):
        return (mul11(Ep[..., r0, c0, :], Ep[..., r1, c1, :])
                - mul11(Ep[..., r0, c1, :], Ep[..., r1, c0, :]))

    detE = (mul21(minor(1, 2, 1, 2), Ep[..., 0, 0, :])
            - mul21(minor(1, 2, 0, 2), Ep[..., 0, 1, :])
            + mul21(minor(1, 2, 0, 1), Ep[..., 0, 2, :]))   # (..., 20)

    # EEt[i, j] = sum_k E[i, k] * E[j, k]  (deg2, symmetric)
    EEt = jnp.stack([
        jnp.stack([
            sum(mul11(Ep[..., i, k_, :], Ep[..., j, k_, :]) for k_ in range(3))
            for j in range(3)], axis=-2)
        for i in range(3)], axis=-3)                        # (..., 3, 3, 10)
    trace = EEt[..., 0, 0, :] + EEt[..., 1, 1, :] + EEt[..., 2, 2, :]

    rows = [detE]
    for i in range(3):
        for j in range(3):
            acc = sum(mul21(EEt[..., i, k_, :], Ep[..., k_, j, :])
                      for k_ in range(3)) * 2.0
            acc = acc - mul21(trace, Ep[..., i, j, :])
            rows.append(acc)
    return jnp.stack(rows, axis=-2)                          # (..., 10, 20)


def _eval_Mz(coeffs, z):
    """Hidden-variable matrix M(z): coeffs (..., 10, 20), z (...,) ->
    (..., 10, 10)."""
    S = jnp.asarray(_hidden_var_table())                     # (20, 10, 4)
    zp = jnp.stack([jnp.ones_like(z), z, z * z, z * z * z], axis=-1)
    # M[eq, g] = sum_m coeffs[eq, m] * S[m, g, c] * z^c
    return jnp.einsum("...em,mgc,...c->...eg", coeffs, S, zp)


# ---------------------------------------------------------------------------
# Root finding + solution extraction
# ---------------------------------------------------------------------------

def _detM_at(coeffs, z):
    return _det10_lu(_eval_Mz(coeffs, z))


def five_point_essential(pts1, pts2):
    """Minimal 5-point solver, batched over leading dims.

    pts1, pts2: (..., 5, 2) normalized camera coordinates.

    Returns (E (..., MAX_ROOTS, 3, 3), valid (..., MAX_ROOTS) bool): up to 10
    essential-matrix candidates per sample (padded with identity-scale W
    where fewer real roots exist).
    """
    from .epipolar import _build_epipolar_rows

    A = _build_epipolar_rows(pts1, pts2)                     # (..., 5, 9)
    null4 = _householder_null4(A)                            # (..., 9, 4)
    coeffs = _build_constraint_coeffs(null4)                 # (..., 10, 20)
    batch = coeffs.shape[:-2]

    # normalize rows for conditioning
    rn = jnp.sqrt(jnp.sum(coeffs * coeffs, axis=-1, keepdims=True) + _EPS)
    coeffs = coeffs / rn

    from ..ops.fast import _use_pallas, kernel_gate

    if _use_pallas() and kernel_gate("RPE_PALLAS_5PT"):
        # Fully fused VMEM-resident solve: grid scan, bracketing, bisection,
        # chart-aware null-vector extraction AND Gauss-Newton polish in one
        # kernel with the hypothesis batch in the lane dimension
        # (ops/five_point_pallas.py). The XLA formulation below pads its
        # 10/20-wide trailing dims to 128 lanes on every op — measured
        # ~2 ms/pair of extraction+GN alone at the bench shape.
        from ..ops.five_point_pallas import solve_roots_polished

        flat = coeffs.reshape(-1, 10, 20)
        x, y, r_var, flip, has_root = solve_roots_polished(flat)
        x = x.reshape(*batch, MAX_ROOTS)
        y = y.reshape(*batch, MAX_ROOTS)
        r_var = r_var.reshape(*batch, MAX_ROOTS)
        flip = flip.reshape(*batch, MAX_ROOTS)
        has_root = has_root.reshape(*batch, MAX_ROOTS)
        return _assemble_candidates(null4, x, y, r_var, flip, has_root)
    else:
        # 1) coarse scan on a tan-spaced grid over the whole real line
        t = jnp.linspace(-0.5 * jnp.pi + 1e-3, 0.5 * jnp.pi - 1e-3, GRID)
        zgrid = jnp.tan(t)                                   # (GRID,)
        d = _detM_at(coeffs[..., None, :, :],
                     jnp.broadcast_to(zgrid, (*batch, GRID)))  # (..., GRID)

        sign = jnp.sign(d)
        change = (sign[..., :-1] * sign[..., 1:]) < 0        # (..., GRID-1)
        # first MAX_ROOTS bracket indices (deterministic, padded)
        score = jnp.where(change,
                          -jnp.arange(GRID - 1, dtype=jnp.float32),
                          -jnp.inf)
        _, bidx = jax.lax.top_k(score, MAX_ROOTS)            # (..., R)
        has_root = jnp.take_along_axis(change, bidx, axis=-1)

        t_lo = jnp.take(t, bidx)
        t_hi = jnp.take(t, bidx + 1)
        d_lo = jnp.take_along_axis(d, bidx, axis=-1)

        # 2) bisection on t (z = tan t)
        def body(_, carry):
            lo, hi, dlo = carry
            mid = 0.5 * (lo + hi)
            dm = _detM_at(coeffs[..., None, :, :], jnp.tan(mid))
            same = (jnp.sign(dm) * jnp.sign(dlo)) >= 0
            lo2 = jnp.where(same, mid, lo)
            dlo2 = jnp.where(same, dm, dlo)
            hi2 = jnp.where(same, hi, mid)
            return lo2, hi2, dlo2

        t_lo, t_hi, _ = jax.lax.fori_loop(0, BISECT_ITERS, body,
                                          (t_lo, t_hi, d_lo))
    z_root = jnp.tan(0.5 * (t_lo + t_hi))                    # (..., R)

    # Chart selection per root. The affine (x, y, z, 1) chart degenerates as
    # |z| grows: f32 cannot hold xX + yY + zZ + W once the zZ term dominates
    # by >2^24, and the bisection's t-space precision maps to |dz| ~ z^2 dt,
    # so near-planar samples (whose true roots sit at |z| up to the tan-grid
    # edge ~1e3) lost real roots to extraction noise — measured directly by
    # tests/test_five_point.py::test_near_planar_root_recall_vs_pivoted_f64
    # _oracle. Roots with |z| > 1 are therefore extracted and polished in
    # the projective chart (u, v, w) = (x/z, y/z, 1/z) via the z-degree
    # flip of the SAME coefficients (_flip_table), where they are
    # well-conditioned; E = uX + vY + Z + wW there.
    P = jnp.asarray(_flip_table())
    coeffs_flip = jnp.einsum("...em,mn->...en", coeffs, P)
    flip = jnp.abs(z_root) > 1.0                             # (..., R)
    safe_z = jnp.where(jnp.abs(z_root) > 1e-20, z_root, 1.0)
    r_var = jnp.where(flip, 1.0 / safe_z, z_root)
    coeffs_r = jnp.where(flip[..., None, None],
                         coeffs_flip[..., None, :, :],
                         coeffs[..., None, :, :])            # (..., R, 10, 20)

    # 3) null vector of M(r*) -> monomial vector -> (x, y) [or (u, v)]
    Mz = _eval_Mz(coeffs_r, r_var)                           # (..., R, 10, 10)
    from .eig import smallest_eigvec_sym

    MtM = jnp.einsum("...ki,...kj->...ij", Mz, Mz)
    m = smallest_eigvec_sym(MtM, iters=4)                    # (..., R, 10)
    # monomial order: [x3, x2y, xy2, y3, x2, xy, y2, x, y, 1]
    one = m[..., 9]
    xq = m[..., 7]
    yq = m[..., 8]
    # guard |1-component| ~ 0 with the x2/x ratio
    use_alt = jnp.abs(one) < 1e-8
    x = jnp.where(use_alt, m[..., 4] / (xq + _EPS), xq / (one + _EPS))
    y = jnp.where(use_alt, m[..., 5] / (xq + _EPS), yq / (one + _EPS))

    # Gauss-Newton polish on the full cubic system, in the root's chart.
    x, y, r_var = _gn_refine(coeffs_r, x, y, r_var)
    return _assemble_candidates(null4, x, y, r_var, flip, has_root)


def _assemble_candidates(null4, x, y, r_var, flip, has_root):
    """(x, y, r_var, flip) per root -> normalized E candidates.

    E = x X + y Y + r Z + W in the affine chart; x X + y Y + Z + r W in the
    projective (flip) chart."""
    X = null4[..., None, :, 0]
    Y = null4[..., None, :, 1]
    Z = null4[..., None, :, 2]
    W = null4[..., None, :, 3]
    cz = jnp.where(flip, 1.0, r_var)                         # Z coefficient
    cw = jnp.where(flip, r_var, 1.0)                         # W coefficient
    e_vec = (x[..., None] * X + y[..., None] * Y
             + cz[..., None] * Z + cw[..., None] * W)        # (..., R, 9)
    # Invalid brackets / degenerate extractions can produce inf/NaN; replace
    # those candidates with the (finite) W vector and mark them invalid so
    # downstream masked scoring never sees non-finite values.
    finite = jnp.all(jnp.isfinite(e_vec), axis=-1)
    has_root = has_root & finite
    e_vec = jnp.where(finite[..., None], e_vec,
                      jnp.broadcast_to(W, e_vec.shape))
    E = e_vec.reshape(*e_vec.shape[:-1], 3, 3)
    nrm = jnp.sqrt(jnp.sum(e_vec * e_vec, axis=-1) + _EPS)
    E = E / nrm[..., None, None]
    return E, has_root
