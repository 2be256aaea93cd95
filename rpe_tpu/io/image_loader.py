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


class LazyFrameSource:
    """Per-chunk lazy decode with a small LRU frame cache.

    Eagerly decoding a full sequence costs both wall-clock before the first
    dispatch and O(dataset) host RAM (KITTI seq 00: ~8.5 GB at f32). This
    source decodes only the indices a chunk asks for; the chunked
    double-buffer in pipeline/batch.py stages chunk c+1 (decode + async
    H2D) between dispatching chunk c and blocking on its outputs, so decode
    rides behind device compute. The cache keeps the last ~2 chunks of
    frames so the one-frame overlap between consecutive sequence chunks
    never re-decodes. NOTE: a second full sweep over the sequence (the
    VP-enabled path re-walks all frames after estimation) re-decodes
    frames older than the cache window — that pass costs one extra decode
    per frame on sequences longer than cache_frames, the price of keeping
    host RAM O(chunk) instead of O(sequence).

    Indexable like the eager array for the read patterns batch.py uses:
    `src[list_or_2d_index_array]` -> float32 (.., H, W).
    """

    def __init__(self, paths, to_gray: bool = True, cache_frames: int = 256):
        self.paths = [str(p) for p in paths]
        self.to_gray = to_gray
        self.cache_frames = cache_frames
        self._cache: dict[int, np.ndarray] = {}  # insertion-ordered LRU

    def __len__(self):
        return len(self.paths)

    def get(self, indices) -> np.ndarray:
        idx = np.asarray(indices)
        flat = [int(i) for i in idx.reshape(-1)]
        need = set(flat)
        if len(need) > self.cache_frames:  # oversize request: bypass cache
            order = sorted(need)
            imgs = load_image_batch([self.paths[i] for i in order],
                                    to_gray=self.to_gray)
            table = {i: np.asarray(im, dtype=np.float32)
                     for i, im in zip(order, imgs)}
            out = np.stack([table[i] for i in flat])
            return out.reshape(*idx.shape, *out.shape[1:])
        missing = sorted(i for i in need if i not in self._cache)
        if missing:
            imgs = load_image_batch([self.paths[i] for i in missing],
                                    to_gray=self.to_gray)
            for i, im in zip(missing, imgs):
                self._cache[i] = np.asarray(im, dtype=np.float32)
        for i in need:  # refresh LRU position of every hit
            self._cache[i] = self._cache.pop(i)
        while len(self._cache) > self.cache_frames:
            evict = next(i for i in self._cache if i not in need)
            self._cache.pop(evict)
        out = np.stack([self._cache[i] for i in flat])
        return out.reshape(*idx.shape, *out.shape[1:])

    def __getitem__(self, indices):
        if isinstance(indices, slice):
            indices = list(range(*indices.indices(len(self))))
        return self.get(indices)
