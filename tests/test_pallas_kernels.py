"""Pallas kernels vs their XLA reference formulations (interpret mode on CPU;
the real-TPU path is exercised by bench.py / the driver)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from rpe_tpu.ops.fast import (
    fast_score_map,
    harris_response_map,
    nonmax_suppress_3x3,
)
from rpe_tpu.ops.fast_pallas import fast_harris_rank_map

IMG = "/root/reference/evaluation-runs/single-pair/images/000000.png"


@pytest.fixture(scope="module")
def gray():
    return cv2.imread(IMG, cv2.IMREAD_GRAYSCALE).astype(np.float32)


def test_fused_fast_harris_matches_xla(gray):
    img = jnp.asarray(gray)
    rank_p, blur_p = fast_harris_rank_map(img, 15.0, interpret=True)
    rank_p = np.asarray(rank_p)
    score = nonmax_suppress_3x3(fast_score_map(img, 15.0))
    harris = harris_response_map(img)
    rank_x = np.asarray(jnp.where(score > 0.0, harris, -jnp.inf))

    m = 8  # borders are masked downstream by detect_level's margin
    a, b = rank_p[m:-m, m:-m], rank_x[m:-m, m:-m]
    fa, fb = np.isfinite(a), np.isfinite(b)
    np.testing.assert_array_equal(fa, fb)  # identical corner sets
    sel = fa
    rel = np.abs(a[sel] - b[sel]) / (np.abs(b[sel]) + 1e-3)
    assert rel.max() < 1e-3


def test_fused_kernel_odd_sizes(gray):
    # non-multiple-of-tile heights and non-128-multiple widths
    img = jnp.asarray(gray[:301, :473])
    rank, blur = fast_harris_rank_map(img, 15.0, interpret=True)
    rank = np.asarray(rank)
    assert rank.shape == (301, 473)
    assert np.asarray(blur).shape == (301, 473)
    assert np.isfinite(rank).sum() > 50


def test_fused_blur_matches_reference(gray):
    import cv2 as _cv2

    img = jnp.asarray(gray)
    _, blur = fast_harris_rank_map(img, 15.0, interpret=True)
    ref = _cv2.GaussianBlur(gray, (7, 7), 2.0,
                            borderType=_cv2.BORDER_REFLECT_101)
    m = 8  # kernel edges replicate/wrap; interior must match
    np.testing.assert_allclose(np.asarray(blur)[m:-m, m:-m],
                               ref[m:-m, m:-m], atol=0.05)
