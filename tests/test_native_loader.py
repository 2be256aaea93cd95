"""Native C++ batched PNG decoder vs the PIL oracle (bit-identical)."""

import glob

import numpy as np
import pytest

from rpe_tpu.io.image_loader import load_image, load_image_batch

SIM_IMAGES = sorted(glob.glob(
    "/root/reference/evaluation-runs/simulator-data/data/images/*.png"))[:8]
PHONE_IMAGES = sorted(glob.glob(
    "/root/reference/evaluation-runs/phone-data/data/images/*.png"))[:3]


@pytest.fixture(scope="module")
def native():
    from rpe_tpu.io import native as native_mod

    try:
        native_mod._load()
    except Exception as e:  # pragma: no cover - build env issue
        pytest.skip(f"native loader unavailable: {e}")
    return native_mod


def test_native_gray_bit_identical_to_pil(native):
    batch = native.decode_batch(SIM_IMAGES, to_gray=True)
    ref = np.stack([load_image(p, to_gray=True) for p in SIM_IMAGES])
    assert batch.dtype == np.uint8
    np.testing.assert_array_equal(batch, ref)


def test_native_color_bgr_identical_to_pil(native):
    batch = native.decode_batch(SIM_IMAGES[:2], to_gray=False)
    ref = np.stack([load_image(p, to_gray=False) for p in SIM_IMAGES[:2]])
    np.testing.assert_array_equal(batch, ref)


def test_native_jpeg_gray_bit_identical_to_pil(native):
    # phone-data ships baseline JPEGs with .png extensions; the native
    # decoder replicates libjpeg's islow IDCT + fancy upsampling +
    # fixed-point color conversion, so output matches PIL bit-for-bit on
    # these files (reference decodes them via cv2.imread,
    # src/utils/image_loader.py:23).
    batch = native.decode_batch(PHONE_IMAGES, to_gray=True)
    ref = np.stack([load_image(p, to_gray=True) for p in PHONE_IMAGES])
    diff = np.abs(batch.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # sub-LSB tolerance contract
    assert (diff > 0).mean() < 1e-3


def test_native_jpeg_color_matches_pil(native):
    batch = native.decode_batch(PHONE_IMAGES[:1], to_gray=False)
    ref = np.stack([load_image(p, to_gray=False) for p in PHONE_IMAGES[:1]])
    diff = np.abs(batch.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_load_image_batch_jpeg_matches_pil():
    batch = load_image_batch(PHONE_IMAGES, to_gray=True)
    ref = np.stack([load_image(p, to_gray=True) for p in PHONE_IMAGES])
    diff = np.abs(batch.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_native_missing_file(native):
    with pytest.raises((FileNotFoundError, RuntimeError)):
        native.decode_batch(["/definitely/not/here.png"])


def test_batch_uses_native_for_png():
    batch = load_image_batch(SIM_IMAGES, to_gray=True)
    ref = np.stack([load_image(p) for p in SIM_IMAGES])
    np.testing.assert_array_equal(batch, ref)


def test_lazy_frame_source_matches_eager_and_caches(monkeypatch):
    """LazyFrameSource: same pixels as eager load, per-frame decode happens
    exactly once while the working set fits the cache, and the chunk
    overlap frame is served from cache (the decode/compute-overlap path in
    pipeline/batch.py)."""
    from rpe_tpu.io import image_loader as il

    eager = il.load_image_batch(SIM_IMAGES, to_gray=True).astype(np.float32)

    decoded = []
    real = il.load_image_batch

    def counting(paths, to_gray=True):
        decoded.extend(paths)
        return real(paths, to_gray=to_gray)

    monkeypatch.setattr(il, "load_image_batch", counting)
    src = il.LazyFrameSource(SIM_IMAGES, to_gray=True, cache_frames=6)
    assert len(src) == len(SIM_IMAGES)

    # chunked access with 1-frame overlap, like the sequence batcher
    a = src[[0, 1, 2, 3]]
    np.testing.assert_array_equal(a, eager[:4])
    b = src[[3, 4, 5, 6]]          # frame 3 must come from cache
    np.testing.assert_array_equal(b, eager[3:7])
    assert decoded.count(SIM_IMAGES[3]) == 1
    assert len(decoded) == 7

    # 2-D index arrays (mesh frame blocks) keep their shape
    blk = src[np.array([[4, 5], [5, 6]])]
    assert blk.shape == (2, 2) + eager.shape[1:]
    np.testing.assert_array_equal(blk[1, 0], eager[5])
    assert len(decoded) == 7  # all cached

    # slices (VP stats pass) work; eviction (cache 6 < 8 frames) re-decodes
    c = src[0:8]
    np.testing.assert_array_equal(c, eager)
    assert decoded.count(SIM_IMAGES[0]) == 2  # 0 was evicted, re-decoded

    # oversize single request bypasses the cache but stays correct
    tiny = il.LazyFrameSource(SIM_IMAGES, to_gray=True, cache_frames=2)
    d = tiny[[5, 0, 5, 2]]
    np.testing.assert_array_equal(d, eager[[5, 0, 5, 2]])
