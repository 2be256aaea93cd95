"""Brute-force descriptor matching as a single MXU matmul (pure JAX).

TPU-native replacement for `cv2.BFMatcher(NORM_HAMMING/L2, crossCheck=True)`
(reference: src/core/pose_estimator.py:115-152). Instead of OpenCV's O(N^2)
scalar distance loop, the whole distance matrix is one matrix multiply on the
MXU:

  * Hamming: with descriptors as {0,1} vectors, popcount(a XOR b)
    = |a| + |b| - 2 a.b  — a rank-1-corrected Gram matmul.
  * L2:      ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b — same structure.

Cross-check (mutual nearest neighbor) is two argmins over the distance
matrix; the sort-by-distance + truncate-to-max_matches of the reference
(pose_estimator.py:144-152) becomes a masked top-k. Everything is static
shape: padded descriptor slots are masked with +inf distance, and the output
is a fixed (max_matches,) set of indices plus a validity mask (SURVEY.md §7
static-shape discipline).

Tie-breaking is deterministic: equal distances resolve to the lowest index
(jnp.argmin / lax.top_k are index-stable), mirroring OpenCV's first-minimum
scan and making results reproducible across runs (SURVEY.md §7 "cross-check
matching ties").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# plain Python float (a module-level jnp array would initialize the default
# backend at import time, before callers can select a platform)
_BIG = 3.0e38


def unpack_descriptor_bits(packed):
    """(N, 32) uint8 packed descriptors -> (N, 256) {0,1} uint8.

    Bit order matches OpenCV/numpy little-endian unpackbits so packed cv2 ORB
    descriptors can flow through the same matcher in oracle tests.
    """
    packed = jnp.asarray(packed, dtype=jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)


def hamming_distance_matrix(bits1, bits2):
    """Pairwise Hamming distances via one bf16 MXU matmul.

    bits1: (N1, B) {0,1}; bits2: (N2, B) {0,1}. Returns (N1, N2) float32.
    popcount(a XOR b) = |a| + |b| - 2 a.b. B=256 fits the MXU contraction
    dim exactly (2 x 128 lanes).
    """
    a = bits1.astype(jnp.bfloat16)
    b = bits2.astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    na = jnp.sum(bits1.astype(jnp.float32), axis=-1)
    nb = jnp.sum(bits2.astype(jnp.float32), axis=-1)
    return na[:, None] + nb[None, :] - 2.0 * dot


def l2sq_distance_matrix(d1, d2):
    """Pairwise squared-L2 distances via one MXU matmul (for SIFT floats)."""
    a = jnp.asarray(d1, dtype=jnp.float32)
    b = jnp.asarray(d2, dtype=jnp.float32)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    na = jnp.sum(a * a, axis=-1)
    nb = jnp.sum(b * b, axis=-1)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * dot, 0.0)


def _pad_to(x, n, fill):
    """Right-pad the last axis of 1-D x to length n with `fill`."""
    if x.shape[0] >= n:
        return x[:n]
    pad = jnp.full((n - x.shape[0],), fill, dtype=x.dtype)
    return jnp.concatenate([x, pad])


def _masked(D, valid1, valid2):
    D = jnp.where(valid1[:, None], D, _BIG)
    D = jnp.where(valid2[None, :], D, _BIG)
    return D


@partial(jax.jit, static_argnames=("max_matches",))
def cross_check_match(D, valid1, valid2, max_matches: int = 512):
    """Mutual-nearest-neighbor matching + sort + truncation, static shapes.

    Args:
      D: (N1, N2) distance matrix (any norm).
      valid1, valid2: bool masks for real (non-padded) descriptors.
      max_matches: static output size (reference default 500 -> padded 512).

    Returns dict(idx1, idx2, dist, valid): each (max_matches,), sorted by
    ascending distance with deterministic low-index tie-breaks; `valid` marks
    live entries. Semantics = BFMatcher(crossCheck=True).match + Python
    sort + [:max_matches] (reference pose_estimator.py:144-152).
    """
    D = _masked(D, valid1, valid2)
    nn12 = jnp.argmin(D, axis=1)  # (N1,) best j for each i
    nn21 = jnp.argmin(D, axis=0)  # (N2,) best i for each j
    i_idx = jnp.arange(D.shape[0])
    mutual = (jnp.take(nn21, nn12) == i_idx) & valid1
    best_d = jnp.take_along_axis(D, nn12[:, None], axis=1)[:, 0]
    mutual = mutual & (best_d < _BIG)

    cand_d = jnp.where(mutual, best_d, _BIG)
    # top-k of negative distance = ascending-distance selection, index-stable.
    k = min(max_matches, cand_d.shape[0])
    # hardware-accelerated approximate top-k: which marginal matches make
    # the 500-cap is immaterial (RANSAC consumes an unordered inlier set)
    _, sel = jax.lax.approx_max_k(-cand_d, k)
    idx1 = _pad_to(sel, max_matches, 0)
    idx2 = _pad_to(jnp.take(nn12, sel), max_matches, 0)
    dist = _pad_to(jnp.take(cand_d, sel), max_matches, _BIG)
    valid = dist < _BIG
    return {"idx1": idx1, "idx2": idx2, "dist": dist, "valid": valid}


@partial(jax.jit, static_argnames=("max_matches",))
def ratio_test_match(D, valid1, valid2, ratio: float = 0.75,
                     max_matches: int = 512):
    """Lowe-ratio matching (BASELINE.json config #2; the reference itself
    uses cross-check — both are supported, cross-check is the parity default).

    Keeps i -> nn(i) when d1 < ratio * d2 with d2 the second-best distance.
    Same static-shape output contract as `cross_check_match`.
    """
    D = _masked(D, valid1, valid2)
    # two smallest distances per row via two argmin passes (top_k would
    # fully sort every 4096-wide row on TPU)
    best_idx = jnp.argmin(D, axis=1)
    d_best = jnp.take_along_axis(D, best_idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(D.shape[1])
    D2 = jnp.where(cols[None, :] == best_idx[:, None], _BIG, D)
    d_second = jnp.min(D2, axis=1)
    idx2best = best_idx
    keep = (d_best < ratio * d_second) & valid1 & (d_best < _BIG)
    cand_d = jnp.where(keep, d_best, _BIG)
    k = min(max_matches, cand_d.shape[0])
    _, sel = jax.lax.approx_max_k(-cand_d, k)
    idx1 = _pad_to(sel, max_matches, 0)
    idx2 = _pad_to(jnp.take(idx2best, sel), max_matches, 0)
    dist = _pad_to(jnp.take(cand_d, sel), max_matches, _BIG)
    valid = dist < _BIG
    return {"idx1": idx1, "idx2": idx2, "dist": dist, "valid": valid}
