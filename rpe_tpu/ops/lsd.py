"""Line-segment detection: TPU-friendly LSD equivalent.

Replaces `cv2.createLineSegmentDetector(LSD_REFINE_STD).detect` (reference:
src/core/pose_estimator.py:159-174) for the vanishing-point subsystem.
OpenCV's LSD grows line-support regions with a sequential seed-and-grow scan
— inherently serial. Here the same idea is restructured as *parallel label
propagation* (SURVEY.md §2.2: "acceptable to restructure as dense
gradient-orientation voting"):

  1. 2x2 LSD gradient masks -> magnitude + level-line angle per pixel;
  2. pixels above the LSD gradient threshold participate;
  3. iterated masked 8-neighbor max-pooling propagates a unique label
     (flat index) across pixels whose level-line angles agree within the
     LSD angle tolerance (22.5 deg) — a jit-compiled lax.fori_loop of pure
     vectorized ops (runs on TPU or CPU);
  4. per-component PCA (host, numpy: component count is tiny) produces
     endpoints, length, and width; thin elongated components become
     segments.

Behavioral (not line-for-line) equivalence to LSD is the contract; the VP
voting downstream is gated by the same statistics either way (SURVEY.md §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ANGLE_TOL_DEG = 22.5
# LSD: threshold = q / sin(tol) with q = 2 (quantization error bound)
GRAD_THRESHOLD = 2.0 / np.sin(np.deg2rad(ANGLE_TOL_DEG))
MIN_REGION = 20        # minimum support pixels for a segment
MIN_ASPECT = 2.0       # length/width elongation requirement
PROP_ITERS = 96        # max propagation distance (px) along a region


@functools.partial(jax.jit, static_argnames=("iters",))
def _label_regions(gray, iters: int = PROP_ITERS):
    """Dense gradient field + orientation-gated label propagation.

    gray: (H, W) float32. Returns (labels (H, W) int32 — -1 outside regions,
    angle (H, W) float32 level-line angle, mag (H, W) float32).
    """
    g = gray.astype(jnp.float32)
    # LSD 2x2 masks at (x, y): uses pixels (x,y),(x+1,y),(x,y+1),(x+1,y+1)
    s = jnp.pad(g, ((0, 1), (0, 1)), mode="edge")
    gx = (s[:-1, 1:] + s[1:, 1:] - s[:-1, :-1] - s[1:, :-1]) * 0.5
    gy = (s[1:, :-1] + s[1:, 1:] - s[:-1, :-1] - s[:-1, 1:]) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    # level-line angle (direction along the edge): atan2(gx, -gy)
    ang = jnp.arctan2(gx, -gy)

    h, w = g.shape
    mask = mag > GRAD_THRESHOLD
    flat = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    labels = jnp.where(mask, flat, -1)

    shifts = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
              (0, 1), (1, -1), (1, 0), (1, 1)]
    tol = jnp.float32(np.deg2rad(ANGLE_TOL_DEG))

    def angdiff_ok(a, b):
        # level-line angles are orientation-like modulo pi
        d = jnp.abs(a - b)
        d = jnp.minimum(d, jnp.pi * 2 - d)
        d = jnp.minimum(d, jnp.abs(d - jnp.pi))
        return d < tol

    def body(_, labels):
        out = labels
        for dy, dx in shifts:
            nl = jnp.roll(labels, (dy, dx), axis=(0, 1))
            na = jnp.roll(ang, (dy, dx), axis=(0, 1))
            ok = mask & (nl >= 0) & angdiff_ok(ang, na)
            out = jnp.maximum(out, jnp.where(ok, nl, -1))
        return out

    labels = jax.lax.fori_loop(0, iters, body, labels)
    return labels, ang, mag


def detect_line_segments(gray, min_region: int = MIN_REGION,
                         min_aspect: float = MIN_ASPECT) -> np.ndarray:
    """Detect line segments; returns (N, 4) float64 [x1, y1, x2, y2].

    Same output contract as the reference's `_detect_lsd_lines`
    (pose_estimator.py:160-174): (0, 4) array when nothing is found.
    """
    gray = np.asarray(gray, dtype=np.float32)
    labels, _, mag = _label_regions(jnp.asarray(gray))
    return segments_from_labels(np.asarray(labels), np.asarray(mag),
                                min_region, min_aspect)


@functools.partial(jax.jit, static_argnames=("max_segments", "min_region",
                                             "min_aspect"))
def detect_line_segments_device(gray, max_segments: int = 256,
                                min_region: int = MIN_REGION,
                                min_aspect: float = MIN_ASPECT):
    """Fully device-resident twin of `detect_line_segments` (jittable).

    Static-shape output: (segs (max_segments, 4) f32, valid (max_segments,)
    bool). Per-component statistics are computed with segment reductions
    (scatter-add / scatter-min / scatter-max keyed by the propagated label,
    which is a flat pixel index), so nothing leaves the device — this is
    what lets the whole VP refinement subsystem run inside one jit program
    (SURVEY.md §7 step 8: jit-compatible override of the reference's
    host-side path, pose_estimator.py:159-386).

    Components are the `max_segments` largest label bins by pixel count;
    the host twin keeps every bin (np.unique), so images with more than
    `max_segments` supported regions lose the smallest ones here — those
    are also the shortest segments, which the voting's top-`max_lines`
    truncation discards anyway.
    """
    gray = gray.astype(jnp.float32)
    labels, _, mag = _label_regions(gray)
    h, w = gray.shape
    hw = h * w

    maskpix = labels >= 0
    # sentinel bin hw swallows non-region pixels
    idx = jnp.where(maskpix, labels, hw).ravel()
    wgt = jnp.where(maskpix, mag, 0.0).ravel()
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).ravel()
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).ravel()

    def scat(vals):
        return jnp.zeros(hw + 1, jnp.float32).at[idx].add(vals)

    cnt = scat(maskpix.astype(jnp.float32).ravel())
    sw = scat(wgt)
    swx = scat(wgt * x)
    swy = scat(wgt * y)
    sw_safe = jnp.maximum(sw, 1e-12)
    cx = swx / sw_safe
    cy = swy / sw_safe

    dxp = x - cx[idx]
    dyp = y - cy[idx]
    sxx = scat(wgt * dxp * dxp) / sw_safe
    syy = scat(wgt * dyp * dyp) / sw_safe
    sxy = scat(wgt * dxp * dyp) / sw_safe

    # principal axis of the 2x2 covariance per bin (closed form, as host)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    l2 = tr / 2.0 - disc                        # minor eigenvalue
    theta = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)
    ux = jnp.cos(theta)
    uy = jnp.sin(theta)

    # extent along the principal axis -> endpoints (second pass)
    t = dxp * ux[idx] + dyp * uy[idx]
    big = jnp.float32(3.4e38)
    tmin = jnp.full(hw + 1, big, jnp.float32).at[idx].min(
        jnp.where(maskpix.ravel(), t, big))
    tmax = jnp.full(hw + 1, -big, jnp.float32).at[idx].max(
        jnp.where(maskpix.ravel(), t, -big))

    # the max_segments most-supported bins (bin id == label value)
    top_cnt, top = jax.lax.top_k(cnt[:hw], max_segments)

    length = tmax[top] - tmin[top]
    width = 4.0 * jnp.sqrt(jnp.maximum(l2[top], 1e-12))
    valid = ((top_cnt >= min_region)
             & (length >= min_region * 0.5)
             & (length / jnp.maximum(width, 1.0) >= min_aspect))

    cxg, cyg = cx[top], cy[top]
    uxg, uyg = ux[top], uy[top]
    segs = jnp.stack([cxg + tmin[top] * uxg, cyg + tmin[top] * uyg,
                      cxg + tmax[top] * uxg, cyg + tmax[top] * uyg], axis=1)
    segs = jnp.where(valid[:, None], segs, 0.0)
    return segs, valid


def segments_from_labels(labels, mag_np, min_region: int = MIN_REGION,
                         min_aspect: float = MIN_ASPECT) -> np.ndarray:
    """Per-component PCA -> segments from a precomputed label/mag field.

    Split out so batched callers (geometry/vp_refine.py
    manhattan_dirs_for_frames) can run the device labeling pass for a whole
    frame stack in one dispatch and feed each frame's result here.
    """
    ys, xs = np.nonzero(labels >= 0)
    if ys.size == 0:
        return np.zeros((0, 4), dtype=np.float64)
    lab = labels[ys, xs]
    wgt = mag_np[ys, xs].astype(np.float64)

    # Compact label ids, then vectorized per-component moments
    uniq, inv, counts = np.unique(lab, return_inverse=True, return_counts=True)
    keep = counts >= min_region
    if not keep.any():
        return np.zeros((0, 4), dtype=np.float64)

    n = uniq.size
    x = xs.astype(np.float64)
    y = ys.astype(np.float64)
    sw = np.bincount(inv, weights=wgt, minlength=n)
    swx = np.bincount(inv, weights=wgt * x, minlength=n)
    swy = np.bincount(inv, weights=wgt * y, minlength=n)
    cx = swx / sw
    cy = swy / sw
    dx = x - cx[inv]
    dy = y - cy[inv]
    sxx = np.bincount(inv, weights=wgt * dx * dx, minlength=n) / sw
    syy = np.bincount(inv, weights=wgt * dy * dy, minlength=n) / sw
    sxy = np.bincount(inv, weights=wgt * dx * dy, minlength=n) / sw

    # principal axis of the 2x2 covariance (closed form)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = np.sqrt(np.maximum(tr * tr / 4.0 - det, 0.0))
    l1 = tr / 2.0 + disc      # major eigenvalue
    l2 = tr / 2.0 - disc      # minor eigenvalue
    theta = 0.5 * np.arctan2(2.0 * sxy, sxx - syy)
    ux, uy = np.cos(theta), np.sin(theta)

    # extent along the principal axis -> endpoints
    t = dx * ux[inv] + dy * uy[inv]
    tmin = np.full(n, np.inf)
    tmax = np.full(n, -np.inf)
    np.minimum.at(tmin, inv, t)
    np.maximum.at(tmax, inv, t)

    length = tmax - tmin
    width = 2.0 * np.sqrt(np.maximum(l2, 1e-12)) * 2.0  # ~2 sigma each side
    ok = keep & (length >= min_region * 0.5) & (length / np.maximum(width, 1.0)
                                                >= min_aspect)
    if not ok.any():
        return np.zeros((0, 4), dtype=np.float64)

    x1 = cx + tmin * ux
    y1 = cy + tmin * uy
    x2 = cx + tmax * ux
    y2 = cy + tmax * uy
    segs = np.stack([x1, y1, x2, y2], axis=1)[ok]
    return segs.astype(np.float64)
