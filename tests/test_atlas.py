"""Atlas detection path vs the per-level reference path (must be
descriptor-identical for co-located keypoints) + banded extraction edge
cases."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from rpe_tpu.ops.atlas import banded_extract, build_atlas, CAP, \
    gaussian_blur_rolled
from rpe_tpu.ops.orb import (
    orb_detect_and_describe,
    orb_detect_and_describe_atlas,
)

IMG = "/root/reference/evaluation-runs/single-pair/images/000000.png"


@pytest.fixture(scope="module")
def gray():
    return cv2.imread(IMG, cv2.IMREAD_GRAYSCALE).astype(np.float32)


def test_atlas_matches_per_level_descriptors(gray):
    img = jnp.asarray(gray)
    a = orb_detect_and_describe_atlas(img, nfeatures=1500, nlevels=6,
                                      max_kpts=1536)
    b = orb_detect_and_describe(img, nfeatures=1500, nlevels=6,
                                max_kpts=1536, use_atlas=False)
    va, vb = np.asarray(a["valid"]), np.asarray(b["valid"])
    assert va.sum() > 0.85 * vb.sum()  # band caps may drop a few

    xa = np.asarray(a["xy"])[va]
    xb = np.asarray(b["xy"])[vb]
    d, idx = cKDTree(xb).query(xa, k=1)
    assert (d < 0.5).mean() > 0.97

    bits_a = np.asarray(a["bits"])[va]
    bits_b = np.asarray(b["bits"])[vb]
    sel = d < 0.5
    ham = (bits_a[sel] != bits_b[idx[sel]]).sum(1)
    assert np.median(ham) == 0  # identical descriptors for identical kpts
    assert (ham == 0).mean() > 0.9

    ang_a = np.asarray(a["angle"])[va][sel]
    ang_b = np.asarray(b["angle"])[vb][idx[sel]]
    dd = np.abs(((ang_a - ang_b + np.pi) % (2 * np.pi)) - np.pi)
    assert np.median(dd) < 1e-5


def test_banded_extract_matches_direct_slicing(gray):
    img = jnp.asarray(gray[:320, :640])
    levels = [img]
    atlas, (offsets, total, wp) = build_atlas([img], 320, 640, 1, 1.1)
    blurred = gaussian_blur_rolled(atlas)
    rng = np.random.default_rng(0)
    k = 64
    off = offsets[0][0]
    xy = np.stack([rng.integers(20, 620, k),
                   rng.integers(off + 20, off + 300, k)], 1).astype(np.float32)
    valid = np.ones(k, bool)
    ext = banded_extract(atlas, blurred, jnp.asarray(xy), jnp.asarray(valid))
    praw = np.asarray(ext["patches_raw"])
    atlas_np = np.asarray(atlas)
    order = np.asarray(ext["order"])
    slots = np.asarray(ext["slot_of_sorted"])
    vs = np.asarray(ext["valid_sorted"])
    assert vs.sum() == k
    for i in range(k):
        if not vs[i]:
            continue
        x, y = xy[order[i]].astype(int)
        ref = atlas_np[y - 15:y + 16, x - 15:x + 16]
        np.testing.assert_allclose(praw[slots[i]], ref, atol=1e-4)


def test_banded_extract_cap_overflow():
    """More keypoints in one band than CAP: extras invalidated, no crash."""
    atlas = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (160, 256)).astype(np.float32))
    blurred = atlas
    k = CAP + 20
    xy = np.stack([np.linspace(20, 230, k), np.full(k, 80.0)], 1)
    valid = np.ones(k, bool)
    ext = banded_extract(atlas, blurred, jnp.asarray(xy, jnp.float32),
                         jnp.asarray(valid))
    vs = np.asarray(ext["valid_sorted"])
    assert vs.sum() == CAP
    assert (~vs).sum() == 20


def test_fused_atlas_matches_resize_chain():
    """build_atlas_fused (banded-matmul resize) vs build_pyramid+build_atlas:
    same layout, values within matmul-reassociation tolerance on [0,255]."""
    import jax
    from rpe_tpu.ops.atlas import build_atlas_fused
    from rpe_tpu.ops.pyramid import build_pyramid

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 255, size=(180, 320)).astype(np.float32))
    levels = build_pyramid(img, 12, 1.1)
    ref, (offs_r, tot_r, wp_r) = build_atlas(levels, 180, 320, 12, 1.1)
    got, (offs_g, tot_g, wp_g) = build_atlas_fused(img, 12, 1.1)
    assert (offs_r, tot_r, wp_r) == (offs_g, tot_g, wp_g)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)


def test_fused_atlas_detection_equivalence():
    """End-to-end ORB on the fused atlas finds essentially the same
    keypoints as the resize-chain atlas."""
    import os
    from rpe_tpu.ops.orb import orb_detect_and_describe

    rng = np.random.default_rng(8)
    base = rng.uniform(0, 255, size=(45, 80))
    img = jnp.asarray(np.kron(base, np.ones((4, 4))).astype(np.float32))

    os.environ["RPE_NO_FUSED_ATLAS"] = "1"
    try:
        ref = orb_detect_and_describe(img, nfeatures=500, max_kpts=512)
    finally:
        del os.environ["RPE_NO_FUSED_ATLAS"]
    got = orb_detect_and_describe(img, nfeatures=500, max_kpts=512)
    nr, ng = int(ref["valid"].sum()), int(got["valid"].sum())
    assert ng > 0.9 * nr
    # keypoint sets overlap (order-free): match on rounded base coords
    rset = {tuple(p) for p in np.round(
        np.asarray(ref["xy"])[np.asarray(ref["valid"])]).astype(int)}
    gxy = np.round(np.asarray(got["xy"])[np.asarray(got["valid"])]).astype(int)
    frac = np.mean([tuple(p) in rset for p in gxy])
    assert frac > 0.9


def test_onehot_bf16_bit_identical():
    """RPE_ONEHOT_BF16=1 (bf16 one-hot operands on the XLA extraction
    path) must be bit-identical to the f32 default: 0/1 is exact in bf16
    and the selection picks single f32 window values."""
    import os
    from unittest import mock

    import jax

    from rpe_tpu.ops.atlas import BAND

    rng = np.random.default_rng(3)
    ha, wp, k = 30 * BAND, 256, 60
    atlas = jnp.asarray(rng.uniform(0, 255, (ha, wp)).astype(np.float32))
    blur = jnp.asarray(rng.uniform(0, 255, (ha, wp)).astype(np.float32))
    xy = jnp.asarray(np.stack([rng.integers(16, wp - 16, k),
                               rng.integers(16, ha - 40, k)], 1)
                     .astype(np.float32))
    valid = jnp.asarray(np.ones(k, bool))
    a = banded_extract(atlas, blur, xy, valid)
    with mock.patch.dict(os.environ, {"RPE_ONEHOT_BF16": "1"}):
        jax.clear_caches()
        b = banded_extract(atlas, blur, xy, valid)
    jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(a["patches_raw"]),
                                  np.asarray(b["patches_raw"]))
    np.testing.assert_array_equal(np.asarray(a["patches_blur"]),
                                  np.asarray(b["patches_blur"]))


def test_overfull_band_last_slot_not_clobbered():
    """Round-5 bug fix: dropped keypoints (pos >= cap) used to alias the
    band's LAST slot (clip to cap-1), clobbering its rightful keypoint's
    table entry (used=False -> zero patches -> zero descriptor while
    still valid=True). The kept keypoint at pos cap-1 of an over-full
    band must extract its true patch."""
    import jax.numpy as jnp
    import numpy as np

    from rpe_tpu.ops.atlas import banded_extract

    rng = np.random.default_rng(3)
    ha, wp = 64, 128
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    cap = 8
    k = 12  # 12 keypoints, all in band 2 (y in [16, 24)) -> 4 dropped
    xy = np.stack([
        np.linspace(20, 90, k).astype(np.float32),
        np.full(k, 18.0, np.float32)], axis=1)
    valid = np.ones(k, bool)
    ext = banded_extract(jnp.asarray(atlas), jnp.asarray(blurred),
                         jnp.asarray(xy), jnp.asarray(valid), cap=cap)
    order = np.asarray(ext["order"])
    slot = np.asarray(ext["slot_of_sorted"])
    vs = np.asarray(ext["valid_sorted"])
    assert int(vs.sum()) == cap  # 8 kept, 4 dropped
    raw = np.asarray(ext["patches_raw"]).reshape(-1, 31, 31)
    for i in range(k):
        if not vs[i]:
            continue
        oi = order[i]
        x0 = int(np.clip(xy[oi, 0] - 15, 0, wp - 31))
        y0 = int(np.clip(xy[oi, 1] - 15, 0, ha - 31))
        np.testing.assert_array_equal(
            raw[slot[i]], atlas[y0:y0 + 31, x0:x0 + 31],
            err_msg=f"kept keypoint {oi} (sorted {i}, slot {slot[i]})")
