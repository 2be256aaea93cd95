"""Pallas VMEM-resident root finder for the 5-point hidden-variable solver.

The XLA formulation in geometry/five_point.py evaluates det M(z) on arrays
whose trailing dims are 10/20 — every elementwise LU step pads those to the
TPU's 128-lane registers, wasting 6-12x of the VPU (docs/PERF_LOG.md "known
next levers"). This kernel transposes the problem completely: each of the
100 matrix entries is held as its own (8, 128) register with the
*hypothesis batch* filling both the sublane and lane dimensions, so every
Horner/LU step is exactly one native-tile VPU op over 1024 RANSAC samples —
no relayouts, no sublane shuffles, no padding waste. The grid scan, bracket
extraction and bisection all run in one kernel with everything resident in
VMEM; HBM traffic is one read of the coefficients and one write of the
roots.

(The first version of this kernel kept the 10x10 matrix in the
sublane/leading dims with the batch only in lanes; the column extractions
and sublane broadcasts inside the LU made Mosaic relayout-bound — ~40x off
the entry-per-register formulation.)

Semantics match the XLA path (same tan-spaced grid, same first-MAX_ROOTS
bracket order, same sign-based bisection; sign is computed as the product
of pivot signs, which can differ from the det *value*'s sign at borderline
near-zero evaluations — the downstream Gauss-Newton polish absorbs the
final-bracket difference). Replaces the grid/top_k/bisect block of
`five_point_essential` (the compute core behind cv2.findEssentialMat's 5pt
solver, reference src/core/pose_estimator.py:522).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 97            # tan-spaced determinant evaluation points
MAX_ROOTS = 10       # degree bound of det M(z)
BISECT_ITERS = 10
_T0 = -0.5 * np.pi + 1e-3
_DT = (np.pi - 2e-3) / (GRID - 1)
_EPS = 1e-20

_SUB, _LANES = 16, 128
_TILE = _SUB * _LANES        # 2048 hypotheses per grid step


@functools.lru_cache(maxsize=None)
def _prep_matrix():
    """T (400, 200): cp_flat = T @ coeffs_flat^T as ONE MXU matmul.

    cp[(c, e, g), b] = sum_m coeffs[b, (e, m)] * S[m, g, c]. Expressing the
    batch-last transpose as the output layout of a matmul keeps it on the
    MXU — a separate XLA transpose of the (4, 10, 10, B) tensor measured
    24 ms at B=4096, as slow as the whole kernel (docs/PERF_LOG.md).
    Returns numpy (lru_cache must not hold backend-bound jnp arrays).
    """
    from ..geometry.five_point import _hidden_var_table

    S = _hidden_var_table()                      # (20, 10, 4) numpy
    T = np.zeros((400, 200), dtype=np.float32)
    for c in range(4):
        for e in range(10):
            for g in range(10):
                for m in range(20):
                    T[c * 100 + e * 10 + g, e * 20 + m] = S[m, g, c]
    return T


def _lu_sign(m):
    """Sign of det for a 10x10 matrix held as a 10x10 list-of-lists of
    (8, 128) batch registers. Unpivoted LU, identical recurrence to
    geometry/five_point.py `_det10_lu` (same no-pivot rationale)."""
    n = 10
    m = [row[:] for row in m]
    sign = jnp.ones_like(m[0][0])
    for k in range(n - 1):
        piv = m[k][k]
        sign = sign * jnp.sign(piv)
        inv = 1.0 / jnp.where(jnp.abs(piv) > _EPS, piv, 1.0)
        for i in range(k + 1, n):
            f = m[i][k] * inv
            for j in range(k + 1, n):
                m[i][j] = m[i][j] - f * m[k][j]
    return sign * jnp.sign(m[n - 1][n - 1])


def _horner_entry(cp_ref, e, z):
    """M(z) entry e (flattened 10x10 index) via Horner on the cubic
    coefficients; cp_ref rows are [c0 | c1 | c2 | c3] blocks of 100."""
    c0 = cp_ref[e]
    c1 = cp_ref[100 + e]
    c2 = cp_ref[200 + e]
    c3 = cp_ref[300 + e]
    return c0 + z * (c1 + z * (c2 + z * c3))


def _matrix_at(cp_ref, z):
    return [[_horner_entry(cp_ref, i * 10 + j, z) for j in range(10)]
            for i in range(10)]


def _roots_kernel(cp_ref, zlo_ref, zhi_ref, hr_ref, sgn_ref):
    # ---- Phase 1: determinant sign on the tan-spaced grid ----
    def grid_body(i, _):
        t = _T0 + i.astype(jnp.float32) * jnp.float32(_DT)
        z = jnp.tan(t)
        s = _lu_sign(_matrix_at(cp_ref, z))          # (8, 128)
        sgn_ref[pl.ds(i, 1)] = s[None]
        return 0

    jax.lax.fori_loop(0, GRID, grid_body, 0)

    # ---- Phase 2: first-MAX_ROOTS sign-change brackets (grid order) ----
    zero = jnp.zeros((_SUB, _LANES), jnp.float32)
    cnt = zero
    t_lo = [zero] * MAX_ROOTS
    t_hi = [zero] * MAX_ROOTS
    s_lo = [zero] * MAX_ROOTS
    has = [zero] * MAX_ROOTS
    s_prev = sgn_ref[0]
    for g in range(GRID - 1):
        s_next = sgn_ref[g + 1]
        change = (s_prev * s_next < 0.0).astype(jnp.float32)
        cnt = cnt + change
        tg = jnp.float32(_T0 + g * _DT)
        for r in range(MAX_ROOTS):
            m_r = change * (jnp.abs(cnt - (r + 1)) < 0.5)
            t_lo[r] = t_lo[r] + m_r * tg
            t_hi[r] = t_hi[r] + m_r * jnp.float32(_T0 + (g + 1) * _DT)
            s_lo[r] = s_lo[r] + m_r * s_prev
            has[r] = has[r] + m_r
        s_prev = s_next

    # ---- Phase 3: bisection, roots unrolled ----
    def bisect_body(_, carry):
        lo, hi, slo = carry
        lo2, hi2, slo2 = [], [], []
        for r in range(MAX_ROOTS):
            mid = 0.5 * (lo[r] + hi[r])
            sm = _lu_sign(_matrix_at(cp_ref, jnp.tan(mid)))
            same = sm * slo[r] >= 0.0
            lo2.append(jnp.where(same, mid, lo[r]))
            slo2.append(jnp.where(same, sm, slo[r]))
            hi2.append(jnp.where(same, hi[r], mid))
        return lo2, hi2, slo2

    t_lo, t_hi, _ = jax.lax.fori_loop(
        0, BISECT_ITERS, bisect_body, (t_lo, t_hi, s_lo))

    for r in range(MAX_ROOTS):
        zlo_ref[r] = t_lo[r]
        zhi_ref[r] = t_hi[r]
        hr_ref[r] = has[r]


# ---------------------------------------------------------------------------
# Fused solve: brackets + chart-aware null-vector extraction + Gauss-Newton
# ---------------------------------------------------------------------------

# xy-degree of each hidden-variable matrix column group (five_point._XY_GROUPS
# order); the z-degree of group g's polynomial entries is bounded by 3 - deg.
_G_DEG = (3, 3, 3, 3, 2, 2, 2, 1, 1, 0)


@functools.lru_cache(maxsize=None)
def _flip20():
    """FLIP20[m] = index of monomial (a, b, 3-a-b-c) (the projective chart
    flip of five_point._flip_table, as an index map)."""
    from ..geometry.five_point import _M3, _M3_IDX

    return tuple(_M3_IDX[(a, b, 3 - a - b - c)] for (a, b, c) in _M3)


@functools.lru_cache(maxsize=None)
def _m3_exps():
    from ..geometry.five_point import _M3

    return tuple(_M3)


def _entry_chart(cp_ref, e, g, rv, flipm):
    """Hidden-variable matrix entry (e, g) evaluated at the chart variable
    rv: Horner over the entry's z-polynomial, with the coefficient order
    reversed per lane where flipm selects the projective (w = 1/z) chart
    (five_point._flip_table semantics — within a column group of xy-degree
    d the z-degree is <= 3-d and the flip reverses exactly those)."""
    kmax = 3 - _G_DEG[g]
    c = [cp_ref[k * 100 + e * 10 + g] for k in range(kmax + 1)]
    val = jnp.where(flipm, c[0], c[kmax])
    for k in range(kmax - 1, -1, -1):
        val = val * rv + jnp.where(flipm, c[kmax - k], c[k])
    return val


def _solve_root(cp_ref, ce_ref, rv, flipm):
    """Null vector of M(rv) in the selected chart -> (x, y) -> 4-iteration
    Gauss-Newton on the 10 cubic constraints. All values are (SUB, LANES)
    batch registers; returns polished (x, y, rv).

    Extraction: the unpivoted LU of M already reduces it to U with the
    near-zero pivot in the last position at a converged root, so the null
    vector comes from back-substitution with m[9] = 1 — two orders of
    magnitude cheaper than the XLA path's M^T M inverse iteration, and the
    GN polish (same recurrence as five_point._gn_refine) does the final
    convergence either way.
    """
    n = 10
    M = [[_entry_chart(cp_ref, e, g, rv, flipm) for g in range(n)]
         for e in range(n)]
    # full unpivoted LU (same recurrence as _lu_sign, keeping U)
    for k in range(n - 1):
        piv = M[k][k]
        inv = 1.0 / jnp.where(jnp.abs(piv) > _EPS, piv, 1.0)
        for i in range(k + 1, n):
            f = M[i][k] * inv
            for j in range(k + 1, n):
                M[i][j] = M[i][j] - f * M[k][j]
            M[i][k] = f
    # back-substitution U v = 0 with v[9] = 1
    v = [None] * n
    v[9] = jnp.ones_like(rv)
    for i in range(n - 2, -1, -1):
        s = M[i][9]
        for j in range(i + 1, n - 1):
            s = s + M[i][j] * v[j]
        d = M[i][i]
        d = jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d >= 0, 1e-12, -1e-12))
        v[i] = -s / d
    x = jnp.clip(v[7], -1e6, 1e6)
    y = jnp.clip(v[8], -1e6, 1e6)

    # chart-selected constraint coefficients ce_c[e][m]
    FLIP = _flip20()
    exps = _m3_exps()

    def ce(e, m):
        return jnp.where(flipm, ce_ref[400 + e * 20 + FLIP[m]],
                         ce_ref[400 + e * 20 + m])

    def gn_body(_, carry):
        x, y, rv = carry
        xp = [jnp.ones_like(x), x, x * x, x * x * x]
        yp = [jnp.ones_like(y), y, y * y, y * y * y]
        rp = [jnp.ones_like(rv), rv, rv * rv, rv * rv * rv]
        m = [xp[a] * yp[b] * rp[c] for (a, b, c) in exps]
        dmx = [a * xp[a - 1] * yp[b] * rp[c] if a > 0 else None
               for (a, b, c) in exps]
        dmy = [b * xp[a] * yp[b - 1] * rp[c] if b > 0 else None
               for (a, b, c) in exps]
        dmr = [c * xp[a] * yp[b] * rp[c - 1] if c > 0 else None
               for (a, b, c) in exps]
        zero = jnp.zeros_like(x)
        JtJ = [[zero] * 3 for _ in range(3)]
        Jtr = [zero] * 3
        for e in range(10):
            cem = [ce(e, mm) for mm in range(20)]
            r_e = sum(cem[mm] * m[mm] for mm in range(20))
            J = []
            for dm in (dmx, dmy, dmr):
                J.append(sum(cem[mm] * dm[mm] for mm in range(20)
                             if dm[mm] is not None))
            for a_ in range(3):
                Jtr[a_] = Jtr[a_] + J[a_] * r_e
                for b_ in range(a_, 3):
                    JtJ[a_][b_] = JtJ[a_][b_] + J[a_] * J[b_]
        a, b_, c = JtJ[0][0] + 1e-12, JtJ[0][1], JtJ[0][2]
        e_, f = JtJ[1][1] + 1e-12, JtJ[1][2]
        i_ = JtJ[2][2] + 1e-12
        det = (a * (e_ * i_ - f * f) - b_ * (b_ * i_ - f * c)
               + c * (b_ * f - e_ * c))
        det = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        gx, gy, gz = Jtr
        dx = -((e_ * i_ - f * f) * gx + (c * f - b_ * i_) * gy
               + (b_ * f - c * e_) * gz) / det
        dy = -((c * f - b_ * i_) * gx + (a * i_ - c * c) * gy
               + (c * b_ - a * f) * gz) / det
        dz = -((b_ * f - c * e_) * gx + (c * b_ - a * f) * gy
               + (a * e_ - b_ * b_) * gz) / det
        return x + dx, y + dy, rv + dz

    x, y, rv = jax.lax.fori_loop(0, 4, gn_body, (x, y, rv))
    return x, y, rv


def _polish_kernel(cpe_ref, blo_ref, bhi_ref, bhas_ref,
                   x_ref, y_ref, rv_ref, fl_ref, hr_ref):
    """Per-root chart selection + extraction + GN polish, given the bisected
    brackets from `_roots_kernel`. A separate pallas_call keeps each Mosaic
    program small (the single fused variant took >25 min of remote compile);
    the bracket intermediate is 30 floats per hypothesis — negligible."""

    def root_body(r, _):
        tlo = blo_ref[pl.ds(r, 1)][0]
        thi = bhi_ref[pl.ds(r, 1)][0]
        hroot = bhas_ref[pl.ds(r, 1)][0]
        z = jnp.tan(0.5 * (tlo + thi))
        flipm = jnp.abs(z) > 1.0
        safe = jnp.where(jnp.abs(z) > 1e-20, z, 1.0)
        rv = jnp.where(flipm, 1.0 / safe, z)
        x, y, rv2 = _solve_root(cpe_ref, cpe_ref, rv, flipm)
        # invalid brackets carry garbage; zero them so downstream masking
        # never sees non-finite values
        ok = hroot > 0.5
        x_ref[pl.ds(r, 1)] = jnp.where(ok, x, 0.0)[None]
        y_ref[pl.ds(r, 1)] = jnp.where(ok, y, 0.0)[None]
        rv_ref[pl.ds(r, 1)] = jnp.where(ok, rv2, 0.0)[None]
        fl_ref[pl.ds(r, 1)] = flipm.astype(jnp.float32)[None]
        hr_ref[pl.ds(r, 1)] = hroot[None]
        return 0

    jax.lax.fori_loop(0, MAX_ROOTS, root_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_roots_polished(coeffs, interpret: bool = False):
    """Fused root solve: brackets + bisection + chart-aware extraction + GN.

    Args:
      coeffs: (B, 10, 20) row-normalized constraint coefficients.

    Returns (x, y, rv, flip, has_root), each (B, MAX_ROOTS):
      the polished solution of the 10 cubic constraints per real root, in
      the chart selected by `flip` — E = x X + y Y + rv Z + W where flip is
      False, E = x X + y Y + Z + rv W where True (five_point_essential
      assembles it). Replaces the XLA nullvector + _gn_refine path, whose
      10/20-wide trailing dims pad to 128 lanes on every op (~2 ms/pair of
      the RANSAC budget at the bench shape — the dominant pipeline cost).
    """
    B = coeffs.shape[0]
    # [cp (400); ce (200)] in one MXU matmul (batch-last transpose implicit)
    T = jnp.asarray(_prep_matrix())                  # (400, 200)
    T2 = jnp.concatenate([T, jnp.eye(200, dtype=jnp.float32)], axis=0)
    cpe = jnp.einsum("qm,bm->qb", T2, coeffs.reshape(B, 200))   # (600, B)

    tb = -(-B // _TILE) * _TILE
    if tb != B:
        cpe = jnp.pad(cpe, ((0, 0), (0, tb - B)))
    n_tiles = tb // _TILE
    cpe = cpe.reshape(600, n_tiles, _SUB, _LANES).reshape(
        600, n_tiles * _SUB, _LANES)

    blk_out = pl.BlockSpec((MAX_ROOTS, _SUB, _LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    out_sd = jax.ShapeDtypeStruct((MAX_ROOTS, n_tiles * _SUB, _LANES),
                                  jnp.float32)

    # Stage 1: bracket + bisect (the proven _roots_kernel, reading the cp
    # rows of the combined operand).
    blk_cp = pl.BlockSpec((400, _SUB, _LANES), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    t_lo, t_hi, has_p = pl.pallas_call(
        _roots_kernel,
        out_shape=(out_sd, out_sd, out_sd),
        grid=(n_tiles,),
        in_specs=[blk_cp],
        out_specs=(blk_out, blk_out, blk_out),
        scratch_shapes=[pltpu.VMEM((GRID, _SUB, _LANES), jnp.float32)],
        interpret=interpret,
    )(cpe[:400])

    # Stage 2: chart-aware extraction + Gauss-Newton polish.
    blk_cpe = pl.BlockSpec((600, _SUB, _LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    x, y, rv, fl, has = pl.pallas_call(
        _polish_kernel,
        out_shape=(out_sd,) * 5,
        grid=(n_tiles,),
        in_specs=[blk_cpe, blk_out, blk_out, blk_out],
        out_specs=(blk_out,) * 5,
        interpret=interpret,
    )(cpe, t_lo, t_hi, has_p)

    def unpack(x):
        x = x.reshape(MAX_ROOTS, n_tiles, _SUB, _LANES).reshape(MAX_ROOTS, tb)
        return x[:, :B].T

    return (unpack(x), unpack(y), unpack(rv), unpack(fl) > 0.5,
            unpack(has) > 0.5)


@functools.partial(jax.jit, static_argnames=("interpret",))
def find_root_brackets(coeffs, interpret: bool = False):
    """Bisected root brackets of det M(z) for each hypothesis.

    Args:
      coeffs: (B, 10, 20) row-normalized constraint coefficients
        (geometry/five_point.py `_build_constraint_coeffs` output).

    Returns (t_lo, t_hi, has_root): each (B, MAX_ROOTS); z = tan(t). Roots
    are ordered by grid position, matching the XLA path's top_k bracket
    order; empty slots have t_lo = t_hi = 0 and has_root False.
    """
    B = coeffs.shape[0]
    # cubic-in-z coefficients, c-major then entry, batch last: (400, B) in
    # one MXU matmul (transpose implicit in the output layout)
    T = jnp.asarray(_prep_matrix())                  # (400, 200)
    cp = jnp.einsum("qm,bm->qb", T, coeffs.reshape(B, 200))

    tb = -(-B // _TILE) * _TILE
    if tb != B:
        cp = jnp.pad(cp, ((0, 0), (0, tb - B)))
    n_tiles = tb // _TILE
    # batch into (tile, sublane, lane): (400, T*8, 128)
    cp = cp.reshape(400, n_tiles, _SUB, _LANES).reshape(
        400, n_tiles * _SUB, _LANES)

    blk_out = pl.BlockSpec((MAX_ROOTS, _SUB, _LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    out_sd = jax.ShapeDtypeStruct((MAX_ROOTS, n_tiles * _SUB, _LANES),
                                  jnp.float32)
    t_lo, t_hi, has = pl.pallas_call(
        _roots_kernel,
        out_shape=(out_sd, out_sd, out_sd),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((400, _SUB, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(blk_out, blk_out, blk_out),
        scratch_shapes=[pltpu.VMEM((GRID, _SUB, _LANES), jnp.float32)],
        interpret=interpret,
    )(cp)

    def unpack(x):
        x = x.reshape(MAX_ROOTS, n_tiles, _SUB, _LANES).reshape(MAX_ROOTS, tb)
        return x[:, :B].T

    return unpack(t_lo), unpack(t_hi), unpack(has) > 0.5
