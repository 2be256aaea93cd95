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
