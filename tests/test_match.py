"""MXU brute-force matcher vs cv2.BFMatcher oracle (SURVEY.md §4:
'Hamming matrix exact' is the kernel-level contract)."""

import cv2
import numpy as np
import jax.numpy as jnp

from rpe_tpu.ops.match import (
    unpack_descriptor_bits,
    hamming_distance_matrix,
    l2sq_distance_matrix,
    cross_check_match,
    ratio_test_match,
)


def _random_packed(rng, n):
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def test_hamming_matrix_exact(rng):
    d1 = _random_packed(rng, 100)
    d2 = _random_packed(rng, 120)
    b1 = unpack_descriptor_bits(jnp.asarray(d1))
    b2 = unpack_descriptor_bits(jnp.asarray(d2))
    D = np.asarray(hamming_distance_matrix(b1, b2))

    u1 = np.unpackbits(d1, axis=1, bitorder="little")
    u2 = np.unpackbits(d2, axis=1, bitorder="little")
    D_ref = (u1[:, None, :] != u2[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D.astype(np.int32), D_ref)


def test_l2sq_matrix(rng):
    d1 = rng.normal(size=(50, 128)).astype(np.float32)
    d2 = rng.normal(size=(60, 128)).astype(np.float32)
    D = np.asarray(l2sq_distance_matrix(jnp.asarray(d1), jnp.asarray(d2)))
    D_ref = ((d1[:, None, :] - d2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(D, D_ref, rtol=1e-4, atol=1e-2)


def test_cross_check_vs_opencv(rng):
    n1, n2 = 300, 280
    d1 = _random_packed(rng, n1)
    d2 = _random_packed(rng, n2)

    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    cv_matches = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:256]
    cv_set = {(m.queryIdx, m.trainIdx, int(m.distance)) for m in cv_matches}

    b1 = unpack_descriptor_bits(jnp.asarray(d1))
    b2 = unpack_descriptor_bits(jnp.asarray(d2))
    D = hamming_distance_matrix(b1, b2)
    out = cross_check_match(
        D, jnp.ones(n1, bool), jnp.ones(n2, bool), max_matches=256
    )
    ours = {
        (int(i), int(j), int(d))
        for i, j, d, v in zip(out["idx1"], out["idx2"], out["dist"], out["valid"])
        if bool(v)
    }
    # Random 256-bit descriptors produce distance ties, so the mutual-NN sets
    # can differ at tie positions; require >= 90% overlap and identical
    # distance multisets on the overlap.
    inter = ours & cv_set
    assert len(inter) >= 0.9 * min(len(ours), len(cv_set)), (
        len(inter), len(ours), len(cv_set))
    # rows where the minimum is unique must agree exactly
    Dn = np.asarray(D)
    for (i, j, d) in cv_set:
        row = Dn[i]
        if (row == row.min()).sum() == 1 and row.min() == d:
            col = Dn[:, j]
            if (col == col.min()).sum() == 1:
                assert (i, j, d) in ours


def test_cross_check_truncation_and_order(rng):
    n = 200
    d1 = _random_packed(rng, n)
    d2 = d1.copy()  # identical -> zero-distance diagonal matches
    b1 = unpack_descriptor_bits(jnp.asarray(d1))
    D = hamming_distance_matrix(b1, b1)
    out = cross_check_match(D, jnp.ones(n, bool), jnp.ones(n, bool), max_matches=64)
    dist = np.asarray(out["dist"])
    valid = np.asarray(out["valid"])
    assert valid.sum() == 64  # truncated to max_matches
    assert (dist[valid] == 0).all()
    assert (np.asarray(out["idx1"])[valid] == np.asarray(out["idx2"])[valid]).all()
    # ascending distance order among valid entries
    assert (np.diff(dist[valid]) >= 0).all()


def test_padding_masks(rng):
    n1, n2 = 64, 64
    d1 = _random_packed(rng, n1)
    d2 = _random_packed(rng, n2)
    b1 = unpack_descriptor_bits(jnp.asarray(d1))
    b2 = unpack_descriptor_bits(jnp.asarray(d2))
    D = hamming_distance_matrix(b1, b2)
    valid1 = jnp.arange(n1) < 40
    valid2 = jnp.arange(n2) < 30
    out = cross_check_match(D, valid1, valid2, max_matches=64)
    idx1 = np.asarray(out["idx1"])[np.asarray(out["valid"])]
    idx2 = np.asarray(out["idx2"])[np.asarray(out["valid"])]
    assert (idx1 < 40).all()
    assert (idx2 < 30).all()


def test_ratio_test_vs_opencv(rng):
    n1, n2 = 150, 160
    d1 = rng.normal(size=(n1, 128)).astype(np.float32)
    d2 = rng.normal(size=(n2, 128)).astype(np.float32)

    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(d1, d2, k=2)
    cv_keep = {
        (m.queryIdx, m.trainIdx)
        for m, m2 in knn
        if m.distance < 0.8 * m2.distance
    }

    D = l2sq_distance_matrix(jnp.asarray(d1), jnp.asarray(d2))
    # ratio on squared distances: d < r*d2  <=>  d^2 < r^2*d2^2
    out = ratio_test_match(
        D, jnp.ones(n1, bool), jnp.ones(n2, bool), ratio=0.8 ** 2, max_matches=256
    )
    ours = {
        (int(i), int(j))
        for i, j, v in zip(out["idx1"], out["idx2"], out["valid"])
        if bool(v)
    }
    assert ours == cv_keep
