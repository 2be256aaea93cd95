"""Fused cross-check matcher: distance matmul + mutual-argmin in one Pallas pass.

The XLA path (ops/match.py) materializes the full (N1, N2) distance matrix in
HBM (67 MB at 4096 descriptors) and re-reads it for each argmin/mask pass —
~0.66 ms/pair of the round-2 stage budget (docs/PERF_LOG.md), almost all HBM
traffic. This kernel never materializes D: each grid step computes one
(TILE, N2) tile of -2*a.b on the MXU in VMEM, reduces the row-wise nearest
neighbor for that tile, and folds the column-wise nearest neighbor into a
carry that lives in the (constant-index) output block across the sequential
grid. HBM traffic drops from ~4x67 MB to the descriptor inputs + four (N,)
vectors.

Both supported norms decompose over the same Gram tile:
  * Hamming ({0,1} bits): popcount(a XOR b) = |a| + |b| - 2 a.b
  * squared L2 (SIFT floats): ||a-b||^2   = |a|^2 + |b|^2 - 2 a.b
The per-row argmin is invariant to the row-constant |a| term, so rows reduce
over |b| - 2 a.b and columns over |a| - 2 a.b; the |a| term is restored on
the reduced (N,) vector afterwards.

Equivalence with ops/match.py `cross_check_match`:
  * Hamming: bit-identical (tested). bf16 inputs are exact for bits, the
    f32 Gram accumulation is exact for <= 256-term integer sums, validity
    masks fold into the norm vectors as +_BIG (at f32 precision _BIG
    absorbs every subsequent +-O(512) term — ulp(_BIG) ~ 3e31 — so masked
    lanes reproduce the XLA path's exact _BIG sentinel), and ties resolve
    to the lowest index as jnp.argmin does: within a tile via an explicit
    min-of-iota-where-minimal reduction (Mosaic's own argmin tie-break is
    unspecified — a hardware run drifted 2/512 indices vs XLA on equal
    distances), across tiles via a strict `<` carry update.
  * L2: equal match sets up to f32 matmul reassociation — exact-duplicate
    descriptors (distance ~0 ties) may resolve to a different equally-near
    neighbor than the XLA path's clamped matrix.

Replaces the distance-matrix half of `cv2.BFMatcher(NORM_HAMMING/NORM_L2,
crossCheck=True)` (reference: src/core/pose_estimator.py:115-152).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .match import _BIG, _pad_to

_TILE = 128  # rows of desc1 per grid step (VMEM: ~2 MB dot tile at N2=4096)


def _match_kernel(a_ref, b_ref, nam_ref, nbm_ref,
                  rmin_ref, rarg_ref, cmin_ref, carg_ref):
    # Row-indexed vectors travel as (N1, 1) columns and column-indexed ones
    # as (1, N2) rows: 1-D f32 operands get an XLA layout tile (T(1024))
    # that Mosaic's (T(128)) lowering rejects, and the 2-D shapes also keep
    # every reduction layout-natural (keepdims output lands directly in the
    # block, no sublane<->lane relayout).
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cmin_ref[:] = jnp.full_like(cmin_ref, jnp.inf)
        carg_ref[:] = jnp.zeros_like(carg_ref)

    # (TILE, N2) <- one MXU pass per tile
    dot2 = -2.0 * jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # rows: argmin_j (|b_j| - 2 a_i.b_j), invalid j masked to _BIG via nbm.
    # First-occurrence argmin is spelled out as min(iota where minimal):
    # the equality test is exact (the min is a copied element, no
    # arithmetic), and an all-_BIG row reduces to lane 0 like XLA's
    # argmin-of-constant.
    dr = nbm_ref[:] + dot2                                    # (1,N2)+bcast
    lanes = jax.lax.broadcasted_iota(jnp.int32, dr.shape, 1)
    rmin = jnp.min(dr, axis=1, keepdims=True)
    rmin_ref[:] = rmin
    rarg_ref[:] = jnp.min(jnp.where(dr == rmin, lanes, jnp.int32(2**30)),
                          axis=1, keepdims=True)

    # columns: argmin_i (|a_i| - 2 a_i.b_j), carried across tiles
    dc = nam_ref[:] + dot2                                    # (TILE,1)+bcast
    subl = jax.lax.broadcasted_iota(jnp.int32, dc.shape, 0)
    cmin_tile = jnp.min(dc, axis=0, keepdims=True)
    carg_tile = (jnp.min(jnp.where(dc == cmin_tile, subl, jnp.int32(2**30)),
                         axis=0, keepdims=True) + i * _TILE)
    upd = cmin_tile < cmin_ref[:]   # strict: earlier tile wins ties
    cmin_ref[:] = jnp.where(upd, cmin_tile, cmin_ref[:])
    carg_ref[:] = jnp.where(upd, carg_tile, carg_ref[:])


def _ratio_kernel(a_ref, b_ref, nbm_ref, d1_ref, a1_ref, d2_ref):
    # row-wise best + second-best distance per tile; no cross-tile state
    dot2 = -2.0 * jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dr = nbm_ref[:] + dot2                                    # (1,N2)+bcast
    lanes = jax.lax.broadcasted_iota(jnp.int32, dr.shape, 1)
    d1 = jnp.min(dr, axis=1, keepdims=True)                   # (TILE,1)
    # first-occurrence argmin (see _match_kernel)
    a1 = jnp.min(jnp.where(dr == d1, lanes, jnp.int32(2**30)),
                 axis=1, keepdims=True)
    dr2 = jnp.where(lanes == a1, _BIG, dr)
    d1_ref[:] = d1
    a1_ref[:] = a1
    d2_ref[:] = jnp.min(dr2, axis=1, keepdims=True)


def _row_top2(a, b, na, nb, valid1, valid2, interpret: bool):
    """Row-wise (best_d, best_idx, second_d) true distances via the fused
    tile pass (same |a|-invariance trick as _mutual_nn)."""
    n1, d = a.shape
    n2 = b.shape[0]
    assert n1 % _TILE == 0, f"N1={n1} must be a multiple of {_TILE}"
    nbm = jnp.where(valid2, nb, _BIG).reshape(1, n2)
    grid = (n1 // _TILE,)
    col_vec = pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    d1, a1, d2 = pl.pallas_call(
        _ratio_kernel,
        out_shape=(jax.ShapeDtypeStruct((n1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((n1, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(col_vec, col_vec, col_vec),
        interpret=interpret,
    )(a, b, nbm)
    return d1[:, 0] + na, a1[:, 0], d2[:, 0] + na


@functools.partial(jax.jit,
                   static_argnames=("max_matches", "norm", "interpret"))
def ratio_match_fused(desc1, desc2, valid1, valid2, ratio: float = 0.75,
                      max_matches: int = 512, norm: str = "hamming",
                      interpret: bool = False):
    """Fused Lowe-ratio matcher (BASELINE.json config #2: 'L2 matching and
    Lowe-ratio test' on-chip): same semantics as ops/match.py
    `ratio_test_match` without materializing D. Bit-identical for
    norm='hamming'; reassociation-equal for norm='l2' (clamped at 0)."""
    if norm == "hamming":
        a = desc1.astype(jnp.bfloat16)
        b = desc2.astype(jnp.bfloat16)
        na = jnp.sum(desc1.astype(jnp.float32), axis=-1)
        nb = jnp.sum(desc2.astype(jnp.float32), axis=-1)
    else:
        a = jnp.asarray(desc1, jnp.float32)
        b = jnp.asarray(desc2, jnp.float32)
        na = jnp.sum(a * a, axis=-1)
        nb = jnp.sum(b * b, axis=-1)
    d_best, idx2best, d_second = _row_top2(
        a, b, na, nb, valid1, valid2, interpret)
    if norm != "hamming":
        d_best = jnp.maximum(d_best, 0.0)
        d_second = jnp.maximum(d_second, 0.0)
    # canonicalize dead rows to the XLA path's argmin-of-constant result so
    # even never-kept output slots are bit-identical
    d_best = jnp.where(valid1, d_best, _BIG)
    idx2best = jnp.where(valid1 & (d_best < _BIG), idx2best, 0)
    keep = (d_best < ratio * d_second) & valid1 & (d_best < _BIG)
    cand_d = jnp.where(keep, d_best, _BIG)
    k = min(max_matches, cand_d.shape[0])
    _, sel = jax.lax.approx_max_k(-cand_d, k)
    idx1 = _pad_to(sel, max_matches, 0)
    idx2 = _pad_to(jnp.take(idx2best, sel), max_matches, 0)
    dist = _pad_to(jnp.take(cand_d, sel), max_matches, _BIG)
    valid = dist < _BIG
    return {"idx1": idx1, "idx2": idx2, "dist": dist, "valid": valid}


def _mutual_nn(a, b, na, nb, valid1, valid2, interpret: bool):
    """Shared driver: a (N1, D), b (N2, D) MXU-ready operands; na/nb the
    per-descriptor norm terms (f32). Returns (best_d, nn12, nn21)."""
    n1, d = a.shape
    n2 = b.shape[0]
    assert n1 % _TILE == 0, f"N1={n1} must be a multiple of {_TILE}"
    nam = jnp.where(valid1, na, _BIG).reshape(n1, 1)
    nbm = jnp.where(valid2, nb, _BIG).reshape(1, n2)

    grid = (n1 // _TILE,)
    full_b = pl.BlockSpec((n2, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    col_vec = pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    row_vec = pl.BlockSpec((1, n2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    rmin, rarg, _, carg = pl.pallas_call(
        _match_kernel,
        out_shape=(jax.ShapeDtypeStruct((n1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((1, n2), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full_b,
            col_vec,
            row_vec,
        ],
        out_specs=(col_vec, col_vec, row_vec, row_vec),
        interpret=interpret,
    )(a, b, nam, nbm)
    rmin, rarg, carg = rmin[:, 0], rarg[:, 0], carg[0]
    # restore the row-constant |a| term; masked rows/all-masked columns land
    # exactly on _BIG (absorbed at f32 precision)
    best_d = rmin + na
    # canonicalize invalid rows/columns to the XLA path's argmin-of-constant
    # result (index 0, distance _BIG) — the kernel computes genuine argmins
    # there, which downstream ignores but the bit-identity contract covers
    best_d = jnp.where(valid1, best_d, _BIG)
    rarg = jnp.where(valid1, rarg, 0)
    carg = jnp.where(valid2, carg, 0)
    return best_d, rarg, carg


@functools.partial(jax.jit, static_argnames=("interpret",))
def mutual_nn_hamming(bits1, bits2, valid1, valid2, interpret: bool = False):
    """Mutual-nearest-neighbor pieces for {0,1} bit descriptors.

    bits1: (N1, B), bits2: (N2, B) {0,1}; valid masks (N1,), (N2,).
    Returns (best_d, nn12, nn21): best_d (N1,) f32 true Hamming distance of
    each row's nearest valid column (== _BIG when none), nn12 (N1,) int32,
    nn21 (N2,) int32 — bit-identical to the argmins of the masked XLA
    distance matrix.
    """
    na = jnp.sum(bits1.astype(jnp.float32), axis=-1)
    nb = jnp.sum(bits2.astype(jnp.float32), axis=-1)
    return _mutual_nn(bits1.astype(jnp.bfloat16), bits2.astype(jnp.bfloat16),
                      na, nb, valid1, valid2, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mutual_nn_l2sq(d1, d2, valid1, valid2, interpret: bool = False):
    """Mutual-nearest-neighbor pieces for float descriptors (squared L2).

    Distances equal the XLA path's up to f32 matmul reassociation; the
    XLA path additionally clamps at 0, so exact-duplicate descriptors may
    tie-break differently (see module docstring). best_d is clamped at 0
    for valid rows to match `l2sq_distance_matrix`'s nonnegativity.
    """
    a = jnp.asarray(d1, jnp.float32)
    b = jnp.asarray(d2, jnp.float32)
    na = jnp.sum(a * a, axis=-1)
    nb = jnp.sum(b * b, axis=-1)
    best_d, nn12, nn21 = _mutual_nn(a, b, na, nb, valid1, valid2, interpret)
    return jnp.maximum(best_d, 0.0), nn12, nn21


@functools.partial(jax.jit,
                   static_argnames=("max_matches", "norm", "interpret"))
def cross_check_match_fused(desc1, desc2, valid1, valid2,
                            max_matches: int = 512, norm: str = "hamming",
                            interpret: bool = False):
    """Drop-in fused replacement for the distance matmul + `cross_check_match`
    (bit-identical for norm='hamming'; reassociation-equal for norm='l2')."""
    nn = mutual_nn_hamming if norm == "hamming" else mutual_nn_l2sq
    best_d, nn12, nn21 = nn(desc1, desc2, valid1, valid2,
                            interpret=interpret)
    i_idx = jnp.arange(desc1.shape[0])
    mutual = (jnp.take(nn21, nn12) == i_idx) & valid1 & (best_d < _BIG)
    cand_d = jnp.where(mutual, best_d, _BIG)
    k = min(max_matches, cand_d.shape[0])
    _, sel = jax.lax.approx_max_k(-cand_d, k)
    idx1 = _pad_to(sel, max_matches, 0)
    idx2 = _pad_to(jnp.take(nn12, sel), max_matches, 0)
    dist = _pad_to(jnp.take(cand_d, sel), max_matches, _BIG)
    valid = dist < _BIG
    return {"idx1": idx1, "idx2": idx2, "dist": dist, "valid": valid}
