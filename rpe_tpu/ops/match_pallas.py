"""Fused cross-check Hamming matcher: matmul + mutual-argmin in one Pallas pass.

The XLA path (ops/match.py) materializes the full (N1, N2) distance matrix in
HBM (67 MB at 4096 descriptors) and re-reads it for each argmin/mask pass —
~0.66 ms/pair of the round-2 stage budget (docs/PERF_LOG.md), almost all HBM
traffic. This kernel never materializes D: each grid step computes one
(TILE, N2) tile of -2*a.b on the MXU in VMEM, reduces the row-wise nearest
neighbor for that tile, and folds the column-wise nearest neighbor into a
carry that lives in the (constant-index) output block across the sequential
grid. HBM traffic drops from ~4x67 MB to the descriptor inputs + four (N,)
vectors.

Equivalence with ops/match.py `cross_check_match` (tested bit-exact):
  * popcount(a XOR b) = |a| + |b| - 2 a.b. The per-row argmin is invariant
    to the row-constant |a|, so rows reduce over |b| - 2 a.b; columns reduce
    over |a| - 2 a.b. All quantities are small exact integers in f32.
  * validity masks fold into the norm vectors as +_BIG; at f32 precision
    _BIG absorbs every subsequent +-O(512) term (ulp(_BIG) ~ 3e31), so
    masked lanes reproduce the XLA path's exact _BIG sentinel.
  * ties resolve to the lowest index, as jnp.argmin does: within a tile via
    jnp.argmin itself, across tiles via a strict `<` carry update.

Replaces the distance-matrix half of `cv2.BFMatcher(NORM_HAMMING,
crossCheck=True)` (reference: src/core/pose_estimator.py:115-152).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .match import _BIG, _pad_to

_TILE = 128  # rows of bits1 per grid step (VMEM: ~2 MB dot tile at N2=4096)


def _match_kernel(a_ref, b_ref, nam_ref, nbm_ref,
                  rmin_ref, rarg_ref, cmin_ref, carg_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cmin_ref[:] = jnp.full_like(cmin_ref, jnp.inf)
        carg_ref[:] = jnp.zeros_like(carg_ref)

    # (TILE, N2) <- one MXU pass; bf16 inputs are exact for {0,1} bits and
    # the f32 accumulation is exact for sums of <= 256 terms.
    dot2 = -2.0 * jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # rows: argmin_j (|b_j| - 2 a_i.b_j), invalid j masked to _BIG via nbm
    dr = nbm_ref[:][None, :] + dot2
    rmin_ref[:] = jnp.min(dr, axis=1)
    rarg_ref[:] = jnp.argmin(dr, axis=1).astype(jnp.int32)

    # columns: argmin_i (|a_i| - 2 a_i.b_j), carried across tiles
    dc = nam_ref[:][:, None] + dot2
    cmin_tile = jnp.min(dc, axis=0)
    carg_tile = jnp.argmin(dc, axis=0).astype(jnp.int32) + i * _TILE
    upd = cmin_tile < cmin_ref[:]
    cmin_ref[:] = jnp.where(upd, cmin_tile, cmin_ref[:])
    carg_ref[:] = jnp.where(upd, carg_tile, carg_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def mutual_nn_hamming(bits1, bits2, valid1, valid2, interpret: bool = False):
    """Mutual-nearest-neighbor pieces for {0,1} bit descriptors.

    bits1: (N1, B), bits2: (N2, B) {0,1}; valid masks (N1,), (N2,).
    Returns (best_d, nn12, nn21): best_d (N1,) f32 true Hamming distance of
    each row's nearest valid column (== _BIG when none), nn12 (N1,) int32,
    nn21 (N2,) int32 — bit-identical to the argmins of the masked XLA
    distance matrix.
    """
    n1, nbits = bits1.shape
    n2 = bits2.shape[0]
    assert n1 % _TILE == 0, f"N1={n1} must be a multiple of {_TILE}"
    a = bits1.astype(jnp.bfloat16)
    b = bits2.astype(jnp.bfloat16)
    na = jnp.sum(bits1.astype(jnp.float32), axis=-1)
    nb = jnp.sum(bits2.astype(jnp.float32), axis=-1)
    nam = jnp.where(valid1, na, _BIG)
    nbm = jnp.where(valid2, nb, _BIG)

    grid = (n1 // _TILE,)
    full_b = pl.BlockSpec((n2, nbits), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((_TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    col_block = pl.BlockSpec((n2,), lambda i: (0,), memory_space=pltpu.VMEM)
    rmin, rarg, _, carg = pl.pallas_call(
        _match_kernel,
        out_shape=(jax.ShapeDtypeStruct((n1,), jnp.float32),
                   jax.ShapeDtypeStruct((n1,), jnp.int32),
                   jax.ShapeDtypeStruct((n2,), jnp.float32),
                   jax.ShapeDtypeStruct((n2,), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, nbits), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full_b,
            row_block,
            col_block,
        ],
        out_specs=(row_block, row_block, col_block, col_block),
        interpret=interpret,
    )(a, b, nam, nbm)
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


@functools.partial(jax.jit, static_argnames=("max_matches", "interpret"))
def cross_check_match_fused(bits1, bits2, valid1, valid2,
                            max_matches: int = 512, interpret: bool = False):
    """Drop-in fused replacement for
    hamming_distance_matrix + cross_check_match (bit-identical outputs)."""
    best_d, nn12, nn21 = mutual_nn_hamming(
        bits1, bits2, valid1, valid2, interpret=interpret)
    i_idx = jnp.arange(bits1.shape[0])
    mutual = (jnp.take(nn21, nn12) == i_idx) & valid1 & (best_d < _BIG)
    cand_d = jnp.where(mutual, best_d, _BIG)
    k = min(max_matches, cand_d.shape[0])
    _, sel = jax.lax.approx_max_k(-cand_d, k)
    idx1 = _pad_to(sel, max_matches, 0)
    idx2 = _pad_to(jnp.take(nn12, sel), max_matches, 0)
    dist = _pad_to(jnp.take(cand_d, sel), max_matches, _BIG)
    valid = dist < _BIG
    return {"idx1": idx1, "idx2": idx2, "dist": dist, "valid": valid}
