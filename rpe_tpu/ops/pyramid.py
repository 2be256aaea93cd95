"""Scale-pyramid construction and separable Gaussian blur (pure JAX/XLA).

TPU-native equivalent of the image pyramid inside `cv2.ORB_create(
scaleFactor=1.1, nlevels=12)` (reference: src/core/pose_estimator.py:84-91).
Level sizes follow OpenCV's rounding (size_l = round(size_0 / 1.1^l)) and are
static Python ints, so every level compiles to a fixed-shape XLA program.

Bilinear resampling uses jax.image.resize (half-pixel centers, matching
cv2.resize INTER_LINEAR closely enough for pose-level parity — the contract
is <= 0.5 deg rotation delta, BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, nlevels: int = 12, scale_factor: float = 1.1):
    """Static per-level (h, w) following OpenCV's cvRound(size / scale^l)."""
    shapes = []
    for l in range(nlevels):
        s = scale_factor ** l
        shapes.append((int(round(h / s)), int(round(w / s))))
    return shapes


def build_pyramid(img, nlevels: int = 12, scale_factor: float = 1.1):
    """img (H, W) float32 -> list of `nlevels` arrays, level 0 = input."""
    h, w = img.shape
    shapes = level_shapes(h, w, nlevels, scale_factor)
    levels = [img]
    for (lh, lw) in shapes[1:]:
        levels.append(jax.image.resize(img, (lh, lw), method="linear"))
    return levels


def _gaussian_kernel1d(ksize: int, sigma: float):
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return jnp.asarray(k, dtype=jnp.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding (OpenCV BORDER_REFLECT_101).

    Matches the 7x7 sigma=2 blur OpenCV ORB applies before descriptor
    sampling. img: (H, W) float32.
    """
    k = _gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, ksize, 1),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (r, r)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, 1, ksize),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


def box_filter(img, ksize: int):
    """Unnormalized ksize x ksize box sum via two separable convolutions."""
    k = jnp.ones((ksize,), dtype=jnp.float32)
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, ksize, 1),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (r, r)))
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, 1, ksize),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x
