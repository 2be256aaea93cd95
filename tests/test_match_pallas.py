"""Fused Pallas cross-check matcher vs the XLA distance-matrix path.

The contract is bit-identical outputs (ops/match_pallas.py docstring): same
mutual-NN indices, same distances, same tie resolution, same handling of
invalid descriptor slots.
"""

import numpy as np
import jax.numpy as jnp

from rpe_tpu.ops.match import (
    cross_check_match,
    hamming_distance_matrix,
    unpack_descriptor_bits,
)
from rpe_tpu.ops.match_pallas import cross_check_match_fused, mutual_nn_hamming


def _random_bits(rng, n, n_valid, nbits=256):
    bits = (rng.random((n, nbits)) < 0.5).astype(np.uint8)
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    # padded slots carry garbage on purpose — they must be masked out
    return jnp.asarray(bits), jnp.asarray(valid)


def test_mutual_nn_matches_xla_argmins():
    rng = np.random.default_rng(0)
    bits1, valid1 = _random_bits(rng, 256, 201)
    bits2, valid2 = _random_bits(rng, 384, 322)
    D = hamming_distance_matrix(bits1, bits2)
    from rpe_tpu.ops.match import _masked
    Dm = _masked(D, valid1, valid2)

    best_d, nn12, nn21 = mutual_nn_hamming(
        bits1, bits2, valid1, valid2, interpret=True)
    np.testing.assert_array_equal(np.asarray(nn12), np.argmin(Dm, axis=1))
    np.testing.assert_array_equal(np.asarray(nn21), np.argmin(Dm, axis=0))
    np.testing.assert_array_equal(
        np.asarray(best_d), np.min(Dm, axis=1))


def test_cross_check_fused_bit_identical():
    rng = np.random.default_rng(1)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        bits1, valid1 = _random_bits(rng, 256, 250)
        bits2, valid2 = _random_bits(rng, 256, 199)
        D = hamming_distance_matrix(bits1, bits2)
        ref = cross_check_match(D, valid1, valid2, max_matches=128)
        got = cross_check_match_fused(
            bits1, bits2, valid1, valid2, max_matches=128, interpret=True)
        for k in ("idx1", "idx2", "dist", "valid"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_cross_check_fused_duplicate_descriptors_tie_break():
    """Exact duplicate descriptors produce distance ties; both paths must
    resolve them to the same (lowest) indices."""
    rng = np.random.default_rng(2)
    bits1, valid1 = _random_bits(rng, 128, 128)
    # bits2 = shuffled copies of bits1 rows plus exact duplicates
    rows = rng.integers(0, 128, size=128)
    bits2 = jnp.asarray(np.asarray(bits1)[rows])
    valid2 = jnp.ones(128, bool)
    D = hamming_distance_matrix(bits1, bits2)
    ref = cross_check_match(D, valid1, valid2, max_matches=64)
    got = cross_check_match_fused(
        bits1, bits2, valid1, valid2, max_matches=64, interpret=True)
    for k in ("idx1", "idx2", "dist", "valid"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_cross_check_fused_no_valid_columns():
    rng = np.random.default_rng(3)
    bits1, valid1 = _random_bits(rng, 128, 100)
    bits2, _ = _random_bits(rng, 128, 0)
    valid2 = jnp.zeros(128, bool)
    got = cross_check_match_fused(
        bits1, bits2, valid1, valid2, max_matches=32, interpret=True)
    assert not bool(np.asarray(got["valid"]).any())


def test_cross_check_fused_on_cv2_packed_descriptors():
    """Packed-uint8 descriptors (cv2 wire format) round-trip through the
    fused matcher identically to the XLA path."""
    rng = np.random.default_rng(4)
    packed1 = rng.integers(0, 256, size=(128, 32), dtype=np.uint8)
    packed2 = rng.integers(0, 256, size=(128, 32), dtype=np.uint8)
    bits1 = unpack_descriptor_bits(jnp.asarray(packed1))
    bits2 = unpack_descriptor_bits(jnp.asarray(packed2))
    v = jnp.ones(128, bool)
    D = hamming_distance_matrix(bits1, bits2)
    ref = cross_check_match(D, v, v, max_matches=64)
    got = cross_check_match_fused(bits1, bits2, v, v, max_matches=64,
                                  interpret=True)
    for k in ("idx1", "idx2", "dist", "valid"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_cross_check_fused_l2_matches_xla_sets():
    """L2 variant: same match sets as the XLA path up to f32 matmul
    reassociation (random float descriptors: no duplicate-distance ties)."""
    from rpe_tpu.ops.match import l2sq_distance_matrix
    rng = np.random.default_rng(5)
    d1 = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(384, 128)).astype(np.float32))
    v1 = jnp.asarray(np.arange(256) < 230)
    v2 = jnp.asarray(np.arange(384) < 300)
    ref = cross_check_match(l2sq_distance_matrix(d1, d2), v1, v2,
                            max_matches=128)
    got = cross_check_match_fused(d1, d2, v1, v2, max_matches=128,
                                  norm="l2", interpret=True)
    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(ref["valid"]))
    m = np.asarray(ref["valid"])
    rset = set(zip(np.asarray(ref["idx1"])[m], np.asarray(ref["idx2"])[m]))
    gset = set(zip(np.asarray(got["idx1"])[m], np.asarray(got["idx2"])[m]))
    assert rset == gset
    np.testing.assert_allclose(np.sort(np.asarray(got["dist"])[m]),
                               np.sort(np.asarray(ref["dist"])[m]),
                               rtol=1e-4, atol=1e-3)


def test_cross_check_fused_l2_nonnegative_self_distance():
    """Identical descriptor sets: self-matches at distance exactly >= 0."""
    rng = np.random.default_rng(6)
    d = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    v = jnp.ones(128, bool)
    got = cross_check_match_fused(d, d, v, v, max_matches=128, norm="l2",
                                  interpret=True)
    m = np.asarray(got["valid"])
    assert m.sum() == 128
    assert (np.asarray(got["dist"])[m] >= 0).all()
    np.testing.assert_array_equal(np.asarray(got["idx1"])[m].sort(),
                                  np.asarray(got["idx2"])[m].sort())


def test_ratio_match_fused_bit_identical_hamming():
    from rpe_tpu.ops.match import ratio_test_match
    from rpe_tpu.ops.match_pallas import ratio_match_fused
    for seed in range(3):
        rng = np.random.default_rng(10 + seed)
        bits1, valid1 = _random_bits(rng, 256, 222)
        # second set = noisy copies of a shuffled subset + fresh random rows:
        # random-vs-random alone keeps almost nothing at ratio 0.9 (best and
        # second-best distances concentrate), which would test the empty path
        rows = rng.integers(0, 256, size=384)
        noise = (rng.random((384, 256)) < 0.08)
        b2 = (np.asarray(bits1)[rows] ^ noise).astype(np.uint8)
        b2[300:] = (rng.random((84, 256)) < 0.5).astype(np.uint8)
        bits2 = jnp.asarray(b2)
        valid2 = jnp.asarray(np.arange(384) < 350)
        D = hamming_distance_matrix(bits1, bits2)
        ref = ratio_test_match(D, valid1, valid2, ratio=0.9, max_matches=128)
        got = ratio_match_fused(bits1, bits2, valid1, valid2, ratio=0.9,
                                max_matches=128, interpret=True)
        assert int(np.asarray(ref["valid"]).sum()) > 50  # genuine keeps
        for k in ("idx1", "idx2", "dist", "valid"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_ratio_match_fused_l2_sets():
    from rpe_tpu.ops.match import l2sq_distance_matrix, ratio_test_match
    from rpe_tpu.ops.match_pallas import ratio_match_fused
    rng = np.random.default_rng(13)
    a = rng.normal(size=(256, 128)).astype(np.float32)
    # noisy copies so the ratio test genuinely keeps matches (see hamming
    # test comment)
    b = (a[rng.integers(0, 256, size=256)]
         + 0.2 * rng.normal(size=(256, 128))).astype(np.float32)
    d1 = jnp.asarray(a)
    d2 = jnp.asarray(b)
    v1 = jnp.asarray(np.arange(256) < 240)
    v2 = jnp.asarray(np.arange(256) < 250)
    ref = ratio_test_match(l2sq_distance_matrix(d1, d2), v1, v2,
                           ratio=0.9 ** 2, max_matches=128)
    got = ratio_match_fused(d1, d2, v1, v2, ratio=0.9 ** 2,
                            max_matches=128, norm="l2", interpret=True)
    m = np.asarray(ref["valid"])
    assert m.sum() > 50  # genuine keeps
    np.testing.assert_array_equal(np.asarray(got["valid"]), m)
    rset = set(zip(np.asarray(ref["idx1"])[m], np.asarray(ref["idx2"])[m]))
    gset = set(zip(np.asarray(got["idx1"])[m], np.asarray(got["idx2"])[m]))
    assert rset == gset
