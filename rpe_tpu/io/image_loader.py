"""Host-side image loading (reference: src/utils/image_loader.py:9-47).

Decoding stays on the host (PNG decode is not TPU work); the grayscale
conversion uses the same ITU-R BT.601 weights as cv2.cvtColor(BGR2GRAY)
(0.299 R + 0.587 G + 0.114 B) so pixel values match the reference bit-for-bit
for 8-bit inputs. A native C++ batched decoder (io/native) is used when built,
with this PIL path as the portable fallback.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(path, to_gray: bool = True) -> np.ndarray:
    """Load one image; grayscale uint8 (H, W) by default.

    Raises FileNotFoundError if the file is missing or unreadable,
    mirroring reference image_loader.py:23-28.
    """
    try:
        img = Image.open(path)
        img.load()
    except (OSError, FileNotFoundError) as e:
        raise FileNotFoundError(f"Could not read image from: {path}") from e
    if to_gray:
        # PIL 'L' = round(0.299 R + 0.587 G + 0.114 B) — same BT.601 weights
        # as cv2 BGR2GRAY.
        if img.mode != "L":
            img = img.convert("L")
        return np.asarray(img, dtype=np.uint8)
    arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
    return arr[..., ::-1]  # BGR channel order for reference compatibility


def load_image_pair(path1, path2, to_gray: bool = True):
    """Load two images (reference image_loader.py:33-47)."""
    return load_image(path1, to_gray), load_image(path2, to_gray)


def load_image_batch(paths, to_gray: bool = True) -> np.ndarray:
    """Load a batch of same-shape images into one (N, H, W) array.

    Uses the native C++ loader when available (parallel decode), else PIL.
    """
    try:
        from .native import decode_batch  # noqa: PLC0415

        return decode_batch(paths, to_gray=to_gray)
    except Exception:
        return np.stack([load_image(p, to_gray) for p in paths])
