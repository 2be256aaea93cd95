"""SIFT detection + description, TPU-first (pure JAX/XLA).

Replaces `cv2.SIFT_create().detectAndCompute` (reference:
src/core/pose_estimator.py:93-94) with a fixed-shape pipeline:

  1. Gaussian scale space: optional 2x initial upsample (OpenCV
     firstOctave=-1 semantics), `noctaves` octaves x (s+3) Gaussian levels
     with incremental separable blurs; DoG by subtraction;
  2. per octave: 3x3x3 extrema of the DoG stack (vectorized 26-neighbor
     comparison), one-step 3D quadratic subpixel refinement (closed-form
     3x3 solve), contrast + Hessian edge rejection (r = 10), static
     per-octave top-k by |contrast|;
  3. orientation: 36-bin gradient histogram over a scale-proportional
     Gaussian window, sampled on a fixed bilinear grid; circular [1,4,6,4,1]
     smoothing; parabolic peak interpolation (dominant peak);
  4. descriptor: 4x4x8 trilinear gradient histogram over a rotated,
     scale-proportional window sampled on a fixed SxS bilinear grid,
     accumulated with a one-hot einsum (no scatter); normalize -> clip 0.2
     -> renormalize (OpenCV's final uint8-scaling is omitted; L2 matching is
     scale-invariant).

Differences vs OpenCV (pose-level parity is the contract, SURVEY.md §7):
fixed bilinear sample grids instead of per-pixel windows, and static
per-octave keypoint quotas instead of a global retainBest. Subpixel
refinement is the full iterative relocation (5 steps, like
adjustLocalExtrema), keypoints sample their own layer's gradients, and
secondary orientation peaks >= 0.8*max emit extra keypoints as in cv2.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SiftConfig
from .pyramid import _gaussian_kernel1d

_S = 3                 # scales per octave (OpenCV nOctaveLayers)
_SIGMA0 = 1.6
_INIT_SIGMA = 0.5      # assumed blur of the input image
_ORI_BINS = 36
_DESC_D = 4            # 4x4 spatial bins
_DESC_B = 8            # 8 orientation bins
_ORI_GRID = 24         # bilinear sample grid for orientation window
_DESC_GRID = 24        # bilinear sample grid for descriptor window
_EDGE_R = 10.0


def _blur_conv(img, sigma):
    """Separable Gaussian via lax.conv (C=1) — MEASURED SLOW on TPU:
    XLA lowers single-channel spatial convs poorly (the 20 pyramid
    passes cost 141 ms/frame at KITTI size, .scratch/tpu_sift_ab.py)."""
    if sigma <= 0.0:
        return img
    ksize = int(2 * round(4.0 * sigma) + 1)
    k = _gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, ksize, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    x = jnp.pad(x, ((0, 0), (r, r)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, 1, ksize), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    return x


def _blur(img, sigma):
    """Separable Gaussian as static-slice shift+fma chains (VPU loop
    fusion; no conv op). Same kernel support as cv2's auto-ksize float
    GaussianBlur (truncate at 4 sigma, 8*sigma+1 wide) — borderline
    contrast/edge decisions track cv2's only with the same support.
    Tap accumulation order differs from XLA's conv reduction by ULPs.
    """
    if sigma <= 0.0:
        return img
    ksize = int(2 * round(4.0 * sigma) + 1)
    r = ksize // 2
    # taps in pure numpy (a jnp kernel under trace is a tracer —
    # CLAUDE.md hazard; same f64->f32 rounding as _gaussian_kernel1d)
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    k = (k / k.sum()).astype(np.float32)
    h, w = img.shape
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    acc = None
    for t in range(ksize):
        term = x[t:t + h, :] * float(k[t])
        acc = term if acc is None else acc + term
    x = jnp.pad(acc, ((0, 0), (r, r)), mode="reflect")
    acc = None
    for t in range(ksize):
        term = x[:, t:t + w] * float(k[t])
        acc = term if acc is None else acc + term
    return acc


def _bilinear_sample(img, xs, ys):
    """Bilinear interpolation of img (H, W) at float coords; clamped."""
    h, w = img.shape
    xs = jnp.clip(xs, 0.0, w - 1.001)
    ys = jnp.clip(ys, 0.0, h - 1.001)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _octave_quotas(max_kpts: int, noctaves: int):
    """Static per-octave keypoint slots, proportional to octave area."""
    weights = [4.0 ** (-o) for o in range(noctaves)]
    total = sum(weights)
    quotas = [max(int(round(max_kpts * w / total)), 32) for w in weights]
    # trim to fit
    while sum(quotas) > max_kpts:
        quotas[quotas.index(max(quotas))] -= 1
    return quotas


_MAX_INTERP_STEPS = 5     # OpenCV SIFT_MAX_INTERP_STEPS


def _cube_derivs(c):
    """Finite-difference gradient/Hessian of a (Q, 3, 3, 3) DoG cube
    indexed [ds, dy, dx] with the sample at the center."""
    dx_ = (c[:, 1, 1, 2] - c[:, 1, 1, 0]) * 0.5
    dy_ = (c[:, 1, 2, 1] - c[:, 1, 0, 1]) * 0.5
    ds_ = (c[:, 2, 1, 1] - c[:, 0, 1, 1]) * 0.5
    ctr = c[:, 1, 1, 1]
    dxx = c[:, 1, 1, 2] + c[:, 1, 1, 0] - 2 * ctr
    dyy = c[:, 1, 2, 1] + c[:, 1, 0, 1] - 2 * ctr
    dss = c[:, 2, 1, 1] + c[:, 0, 1, 1] - 2 * ctr
    dxy = (c[:, 1, 2, 2] - c[:, 1, 2, 0] - c[:, 1, 0, 2] + c[:, 1, 0, 0]) * 0.25
    dxs = (c[:, 2, 1, 2] - c[:, 2, 1, 0] - c[:, 0, 1, 2] + c[:, 0, 1, 0]) * 0.25
    dys = (c[:, 2, 2, 1] - c[:, 2, 0, 1] - c[:, 0, 2, 1] + c[:, 0, 0, 1]) * 0.25
    return ctr, (dx_, dy_, ds_), (dxx, dyy, dss, dxy, dxs, dys)


def _solve_offset(g, H):
    """off = -H^-1 g for the symmetric 3x3 Hessian (adjugate closed form)."""
    gx, gy, gs = g
    a, e, i_, b_, c, f = H
    det = (a * (e * i_ - f * f) - b_ * (b_ * i_ - f * c)
           + c * (b_ * f - e * c))
    inv_ok = jnp.abs(det) > 1e-12
    det = jnp.where(inv_ok, det, 1.0)
    A00 = e * i_ - f * f
    A01 = c * f - b_ * i_
    A02 = b_ * f - c * e
    A11 = a * i_ - c * c
    A12 = c * b_ - a * f
    A22 = a * e - b_ * b_
    offx = -(A00 * gx + A01 * gy + A02 * gs) / det
    offy = -(A01 * gx + A11 * gy + A12 * gs) / det
    offs = -(A02 * gx + A12 * gy + A22 * gs) / det
    return offx, offy, offs, inv_ok


def _detect_octave(gauss, dogs, quota, border=5, select="exact"):
    """Extrema + OpenCV-style iterative subpixel relocation on one octave.

    gauss: list of (H, W) Gaussian levels; dogs: (s+2) DoG maps.
    Returns xy (Q, 2 float, octave coords), layer (Q, float), score (Q,),
    valid (Q,), layer_int (Q, int32 in [1, _S]) for gradient-plane choice.

    Dense 26-neighbor extrema feed a static top-`quota` selection; the
    selected candidates then run OpenCV's adjustLocalExtrema loop (up to 5
    integer relocations of (x, y, layer) when any quadratic offset exceeds
    0.5, discarding non-converged points) via per-candidate 3x3x3 cube
    gathers — the dense one-step-and-clip approximation left ~12% of
    cv2's keypoints unreproduced (PARITY.md round-1 measurement).

    The 26-neighbor comparison is built from SEPARABLE shift-maxes: each
    DoG plane's 3-wide row max is computed once and reused by the plane
    above/below (full 3x3 max) and by the plane itself (8-neighbor max,
    center excluded via the two row neighbors) — bit-identical to the
    naive 26-roll stack on interior pixels (border >= 5 masks the roll
    wrap), but ~5x less HBM traffic and no (26, H, W) materialization.

    select: "exact" (default, matches this signature) = full-sort
    lax.top_k; "approx" = lax.approx_max_k — MEASURED SLOWER on TPU at
    these shapes (1122 vs 644 ms/frame detect, .scratch/tpu_sift_ab.py
    round 4): PartialReduce degenerates at k=3072 over 3*H*W elements;
    "block2" = two top-1 passes per 128-lane block then an exact sort
    over the per-block winners (loses only 3+-extrema-per-block cases).
    """
    h, w = dogs[0].shape
    D = jnp.stack(dogs, axis=0)  # (s+2, H, W)
    val = _extrema_vals(D, border)
    if select == "approx":
        scores0, flat = jax.lax.approx_max_k(val, quota,
                                             recall_target=0.98)
        flat = flat.astype(jnp.int32)
    elif select == "block2":
        # Two exact top-1 passes over 128-element blocks (VPU reduces),
        # then one exact top-k over the 2*nblocks block winners — a
        # ~100x smaller sort than the full 3*H*W lax.top_k. Loses a
        # candidate only when >= 3 extrema share one 128-span of a DoG
        # row (extrema density is ~0.3% so this is rare); candidates are
        # re-ranked exactly afterwards.
        n = val.shape[0]
        nb = -(-n // 128)
        vpad = jnp.pad(val, (0, nb * 128 - n)).reshape(nb, 128)
        i1 = jnp.argmax(vpad, axis=1)
        v1 = jnp.take_along_axis(vpad, i1[:, None], 1)[:, 0]
        vmask = vpad.at[jnp.arange(nb), i1].set(0.0)
        i2 = jnp.argmax(vmask, axis=1)
        v2 = jnp.take_along_axis(vmask, i2[:, None], 1)[:, 0]
        base = jnp.arange(nb, dtype=jnp.int32) * 128
        cv = jnp.concatenate([v1, v2])
        ci = jnp.concatenate([base + i1.astype(jnp.int32),
                              base + i2.astype(jnp.int32)])
        scores0, sel = jax.lax.top_k(cv, quota)
        flat = jnp.minimum(ci[sel], n - 1)
    else:
        scores0, flat = jax.lax.top_k(val, quota)
    return _refine_candidates(D, scores0, flat, h, w, border)


def _extrema_vals(D, border):
    """|DoG| at 26-neighbor extrema, 0 elsewhere, flattened (3*H*W,).

    Built from separable shift-maxes (see _detect_octave docstring)."""
    h, w = D.shape[1], D.shape[2]
    prethr = 0.5 * 0.04 / _S

    def hshift3(d, red):
        return red(red(jnp.roll(d, 1, 1), d), jnp.roll(d, -1, 1))

    # per-plane row-of-3 maxes/mins, computed once and shared across the
    # three center layers
    hmax = [hshift3(D[p], jnp.maximum) for p in range(_S + 2)]
    hmin = [hshift3(D[p], jnp.minimum) for p in range(_S + 2)]

    def full3x3(hm, red):
        return red(red(jnp.roll(hm, 1, 0), hm), jnp.roll(hm, -1, 0))

    def ring8(d, hm, red):
        # 8 neighbors of the center plane: full rows above/below + the
        # two horizontal neighbors of the center row
        return red(red(jnp.roll(hm, 1, 0), jnp.roll(hm, -1, 0)),
                   red(jnp.roll(d, 1, 1), jnp.roll(d, -1, 1)))

    v3max = [full3x3(hmax[p], jnp.maximum) for p in range(_S + 2)]
    v3min = [full3x3(hmin[p], jnp.minimum) for p in range(_S + 2)]

    cands_val = []
    ys_g = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs_g = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    bmask = ((ys_g >= border) & (ys_g < h - border)
             & (xs_g >= border) & (xs_g < w - border))
    for k in range(1, _S + 1):
        d = D[k]
        nmax = jnp.maximum(ring8(d, hmax[k], jnp.maximum),
                           jnp.maximum(v3max[k - 1], v3max[k + 1]))
        nmin = jnp.minimum(ring8(d, hmin[k], jnp.minimum),
                           jnp.minimum(v3min[k - 1], v3min[k + 1]))
        is_max = (d > nmax) & (d > prethr)
        is_min = (d < nmin) & (d < -prethr)
        ext = (is_max | is_min) & bmask
        cands_val.append(jnp.where(ext, jnp.abs(d), 0.0))

    return jnp.stack(cands_val, 0).reshape(-1)           # (3*H*W,)


def _refine_candidates(D, scores0, flat, h, w, border):
    """OpenCV adjustLocalExtrema loop + final contrast/edge checks on the
    selected candidates (see _detect_octave docstring)."""
    pix = flat % (h * w)
    kk = (flat // (h * w)).astype(jnp.int32) + 1         # layer in [1, _S]
    py = (pix // w).astype(jnp.int32)
    px = (pix % w).astype(jnp.int32)
    alive = scores0 > 0.0

    doff = jnp.arange(-1, 2)

    def cube_at(kc, yc, xc):
        KK = kc[:, None, None, None] + doff[None, :, None, None]
        YY = yc[:, None, None, None] + doff[None, None, :, None]
        XX = xc[:, None, None, None] + doff[None, None, None, :]
        return D[jnp.clip(KK, 0, _S + 1),
                 jnp.clip(YY, 0, h - 1),
                 jnp.clip(XX, 0, w - 1)]

    offx = jnp.zeros_like(scores0)
    offy = jnp.zeros_like(scores0)
    offs = jnp.zeros_like(scores0)
    converged = jnp.zeros_like(alive)
    for _step in range(_MAX_INTERP_STEPS):
        c = cube_at(kk, py, px)
        _, g, H = _cube_derivs(c)
        ox, oy, os_, inv_ok = _solve_offset(g, H)
        upd = alive & ~converged
        offx = jnp.where(upd, ox, offx)
        offy = jnp.where(upd, oy, offy)
        offs = jnp.where(upd, os_, offs)
        conv_now = ((jnp.abs(ox) < 0.5) & (jnp.abs(oy) < 0.5)
                    & (jnp.abs(os_) < 0.5))
        converged = converged | (upd & conv_now)
        move = upd & ~conv_now
        px = jnp.where(move, px + jnp.round(ox).astype(jnp.int32), px)
        py = jnp.where(move, py + jnp.round(oy).astype(jnp.int32), py)
        kk = jnp.where(move, kk + jnp.round(os_).astype(jnp.int32), kk)
        in_range = ((kk >= 1) & (kk <= _S)
                    & (px >= border) & (px < w - border)
                    & (py >= border) & (py < h - border))
        alive = alive & in_range & inv_ok
    alive = alive & converged

    # final contrast + edge checks at the converged position (OpenCV order)
    c = cube_at(kk, py, px)
    ctr, g, H = _cube_derivs(c)
    dxx, dyy, _, dxy, _, _ = H[0], H[1], H[2], H[3], H[4], H[5]
    d_hat = ctr + 0.5 * (g[0] * offx + g[1] * offy + g[2] * offs)
    contrast_ok = jnp.abs(d_hat) * _S >= 0.04
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    edge_ok = (det2 > 0) & (tr * tr * _EDGE_R < (_EDGE_R + 1) ** 2 * det2)
    valid = alive & contrast_ok & edge_ok

    xy = jnp.stack([px.astype(jnp.float32) + offx,
                    py.astype(jnp.float32) + offy], axis=-1)
    lay = kk.astype(jnp.float32) + offs
    score = jnp.where(valid, jnp.abs(d_hat), 0.0)
    return xy, lay, score, valid, kk


def _bilinear_sample_stack(imgs, li, xs, ys):
    """Bilinear sample from a per-query plane of a stack.

    imgs: (L, H, W); li: (Q,) int32 plane index; xs, ys: (Q, P) coords.
    """
    _, h, w = imgs.shape
    xs = jnp.clip(xs, 0.0, w - 1.001)
    ys = jnp.clip(ys, 0.0, h - 1.001)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0
    L = li[:, None]
    v00 = imgs[L, y0, x0]
    v01 = imgs[L, y0, x0 + 1]
    v10 = imgs[L, y0 + 1, x0]
    v11 = imgs[L, y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _extract_patches(gstack, li, xy, Py, Px):
    """Per-keypoint (Py, Px) patch of the keypoint's own Gaussian layer.

    gstack: (L, H, W); li: (Q,) int32 layer; xy: (Q, 2) octave coords.
    Returns (patches (Q, Py, Px), x0 (Q,), y0 (Q,)) with x0/y0 the patch
    origin (clamped so the slice stays in-image; in-patch coords are
    exact via xy - origin). One slice-gather (contiguous Px-float rows)
    replaces the ~28M-element random bilinear gathers that were 88% of
    SIFT detect on TPU (.scratch/tpu_sift_stage_probe.py, round 4).
    Py/Px are independent so short-but-wide octaves (e.g. KITTI octave 4,
    47x155) keep real image data along the long axis instead of clamping
    to a square rim (round-5 advisor fix).
    """
    _, h, w = gstack.shape
    y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - Py // 2,
                  0, h - Py)
    x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - Px // 2,
                  0, w - Px)

    def slc(args):
        l, y, x = args
        return jax.lax.dynamic_slice(gstack, (l, y, x), (1, Py, Px))[0]

    patches = jax.vmap(slc)((li, y0, x0))
    return patches, x0, y0


def _patch_grads(patches):
    """Central-difference gradients inside each patch (roll wrap only on
    the 1-px patch rim, which _sep_weights keeps samples off)."""
    gx = (jnp.roll(patches, -1, 2) - jnp.roll(patches, 1, 2)) * 0.5
    gy = (jnp.roll(patches, -1, 1) - jnp.roll(patches, 1, 1)) * 0.5
    return gx, gy


def _sep_weights(u, P):
    """Bilinear interpolation weights for per-axis sample coords.

    u: (Q, G) float in-patch coords -> (Q, G, P) weights with two
    nonzeros per row; samples clamp to [1, P-2] (off the wrapped-
    gradient rim, matching the old image-edge clamp up to the border).
    """
    u = jnp.clip(u, 1.0, P - 2.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    f = (u - u0).astype(jnp.float32)
    oh0 = jax.nn.one_hot(u0, P, dtype=jnp.float32) * (1 - f)[..., None]
    oh1 = jax.nn.one_hot(u0 + 1, P, dtype=jnp.float32) * f[..., None]
    return oh0 + oh1


def _patch_sample(gp, Wy, Wx):
    """Separable bilinear sampling as two batched matmuls (MXU).

    gp: (Q, P, P); Wy: (Q, Gy, P); Wx: (Q, Gx, P) -> (Q, Gy, Gx).
    HIGHEST precision: the selection contractions must not run in
    single-pass bf16 (CLAUDE.md precision rule).
    """
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("qir,qrc->qic", Wy, gp, precision=hi)
    return jnp.einsum("qic,qjc->qij", t, Wx, precision=hi)


def _orientation(gxp, gyp, ucx, ucy, scl, valid):
    """Gradient orientation(s) per keypoint (radians).

    gxp/gyp: (Q, Py, Px) in-patch gradients of each keypoint's own
    Gaussian layer (each keypoint samples its own layer — OpenCV
    calcOrientationHist operates on the keypoint's layer; the round-1
    shared-plane shortcut cost orientation accuracy, PARITY.md).
    Gradients are computed ONCE per octave by the caller and shared with
    _descriptor (round-5 advisor fix: they were recomputed in both).
    ucx/ucy: (Q,) in-patch center coords; scl: (Q,) scale in octave
    coords. Sampling is an axis-aligned separable grid -> two batched
    matmuls per gradient plane, no gathers.

    Returns (theta1, theta2, has2): the dominant orientation and, when a
    second local histogram peak reaches 80% of the max (OpenCV
    SIFT_ORI_PEAK_RATIO), a secondary orientation that becomes an extra
    keypoint — cv2.SIFT emits one keypoint per qualifying peak.
    """
    q, Py, Px = gxp.shape
    g = _ORI_GRID
    lin = (jnp.arange(g) - (g - 1) / 2.0) / ((g - 1) / 2.0)  # [-1, 1]
    gy_, gx_ = jnp.meshgrid(lin, lin, indexing="ij")
    radius = 3.0 * 1.5 * scl                                   # (Q,)
    ux = ucx[:, None] + lin[None, :] * radius[:, None]         # (Q, g)
    uy = ucy[:, None] + lin[None, :] * radius[:, None]
    Wx = _sep_weights(ux, Px)
    Wy = _sep_weights(uy, Py)
    vx = _patch_sample(gxp, Wy, Wx)                            # (Q, g, g)
    vy = _patch_sample(gyp, Wy, Wx)

    mag = jnp.sqrt(vx * vx + vy * vy)
    ang = jnp.arctan2(vy, vx)  # (-pi, pi]
    r2 = gx_ ** 2 + gy_ ** 2
    # cv2 calcOrientationHist weights by exp(-(i^2+j^2)/(2 (1.5 scl)^2))
    # over integer offsets within radius = 3 * 1.5 * scl; in our normalized
    # grid units (r_px = r * radius = r * 3 sigma) the exponent is
    # -9 r^2 / 2 (the previous -2 r^2 was 1.5x too wide a sigma)
    wgt = jnp.exp(-4.5 * r2[None])
    wgt = wgt * (r2[None] <= 1.0)

    bins = jnp.floor((ang / (2 * jnp.pi) + 0.5) * _ORI_BINS).astype(jnp.int32)
    bins = jnp.clip(bins, 0, _ORI_BINS - 1)
    onehot = jax.nn.one_hot(bins, _ORI_BINS, dtype=mag.dtype)  # (Q, g, g, 36)
    hist = jnp.einsum("qij,qijb->qb", mag * wgt, onehot)

    # circular smoothing [1,4,6,4,1]/16 (OpenCV's kernel)
    def smooth(hh):
        return (jnp.roll(hh, 2, -1) + 4 * jnp.roll(hh, 1, -1) + 6 * hh
                + 4 * jnp.roll(hh, -1, -1) + jnp.roll(hh, -2, -1)) / 16.0

    hist = smooth(hist)

    def peak_theta(peak):
        hp = jnp.take_along_axis(hist, peak[:, None], -1)[:, 0]
        hl = jnp.take_along_axis(
            hist, ((peak - 1) % _ORI_BINS)[:, None], -1)[:, 0]
        hr = jnp.take_along_axis(
            hist, ((peak + 1) % _ORI_BINS)[:, None], -1)[:, 0]
        denom = hl - 2 * hp + hr
        safe = jnp.abs(denom) > 1e-12
        interp = jnp.where(safe, 0.5 * (hl - hr)
                           / jnp.where(safe, denom, 1.0), 0.0)
        bin_f = peak.astype(jnp.float32) + interp
        return (bin_f + 0.5) / _ORI_BINS * 2 * jnp.pi - jnp.pi, hp

    peak1 = jnp.argmax(hist, axis=-1)
    theta1, h1 = peak_theta(peak1)

    # secondary: best local peak (strictly above both circular neighbors)
    # other than the dominant bin, qualifying at >= 0.8 * max
    is_local = (hist > jnp.roll(hist, 1, -1)) & (hist > jnp.roll(hist, -1, -1))
    not_primary = (jax.lax.broadcasted_iota(jnp.int32, hist.shape, 1)
                   != peak1[:, None])
    cand = jnp.where(is_local & not_primary, hist, -jnp.inf)
    peak2 = jnp.argmax(cand, axis=-1)
    theta2, h2 = peak_theta(peak2)
    has2 = valid & (h2 >= 0.8 * h1) & jnp.isfinite(
        jnp.take_along_axis(cand, peak2[:, None], -1)[:, 0])
    return theta1, theta2, has2


def _descriptor(gxp, gyp, ucx, ucy, scl, theta):
    """4x4x8 SIFT descriptor from an AXIS-ALIGNED sample grid with
    ROTATED bin coordinates.

    gxp/gyp: (Q, Py, Px) in-patch gradients (shared with _orientation —
    computed once per octave by the caller); ucx/ucy: (Q,) in-patch
    centers. The grid half-width equals the rotated bin square's
    circumradius (OpenCV's radius), so the axis-aligned square contains
    the whole rotated window; samples landing outside the bin range are
    masked by tri() exactly like cv2 discards out-of-bin pixels of its
    own axis-aligned iteration (sift.cpp calcSIFTDescriptor). Keeping
    the grid axis-aligned makes the sampling separable -> two batched
    matmuls, no gathers (the rotated-grid version's random bilinear
    gathers were 88% of detect on TPU).
    """
    q, Py, Px = gxp.shape
    g = _DESC_GRID
    d = _DESC_D
    # window half-width = 3 * scl * (d+1)/2 * sqrt(2) (OpenCV geometry)
    hist_width = 3.0 * scl                              # (Q,)
    radius = hist_width * math.sqrt(2.0) * (d + 1) * 0.5

    lin = (jnp.arange(g) + 0.5) / g * 2.0 - 1.0          # (-1, 1)
    gy_, gx_ = jnp.meshgrid(lin, lin, indexing="ij")
    ux = ucx[:, None] + lin[None, :] * radius[:, None]   # (Q, g)
    uy = ucy[:, None] + lin[None, :] * radius[:, None]
    Wx = _sep_weights(ux, Px)
    Wy = _sep_weights(uy, Py)
    vx = _patch_sample(gxp, Wy, Wx)                      # (Q, g, g)
    vy = _patch_sample(gyp, Wy, Wx)
    mag = jnp.sqrt(vx * vx + vy * vy)
    ang = jnp.arctan2(vy, vx) - theta[:, None, None]

    # bin coords: rotate the grid into the descriptor frame (g' =
    # R(-theta) u), in histogram units [-1,1]*sqrt2*(d+1)/2 -> bins
    ca, sa = jnp.cos(theta), jnp.sin(theta)              # (Q,)
    gxr = gx_[None] * ca[:, None, None] + gy_[None] * sa[:, None, None]
    gyr = -gx_[None] * sa[:, None, None] + gy_[None] * ca[:, None, None]
    rbin = gyr * math.sqrt(2.0) * (d + 1) * 0.5 + d / 2.0 - 0.5
    cbin = gxr * math.sqrt(2.0) * (d + 1) * 0.5 + d / 2.0 - 0.5
    # OpenCV's descriptor gradient convention is y-UP (dy = I[r-1]-I[r+1],
    # sift.cpp calcSIFTDescriptor), so its orientation axis runs opposite
    # to our y-down atan2: negate the relative angle so the 8 orientation
    # bins line up with cv2's (measured: mean descriptor cosine vs cv2
    # 0.667 -> 0.896 on co-located keypoints)
    obin = (-ang / (2 * jnp.pi)) * _DESC_B
    obin = jnp.mod(obin, _DESC_B)

    # Gaussian weighting over the descriptor window. cv2 weights by
    # exp(-(c_rot^2 + r_rot^2) / (0.5 d^2)) in HISTOGRAM units
    # (sift.cpp calcSIFTDescriptor exp_scale); our grid coordinate gx maps
    # to hist units as c_rot = gx * sqrt(2) (d+1) / 2, so the equivalent
    # exponent on the grid is (d+1)^2 / d^2 (= 1.5625 at d=4; the previous
    # d^2/4 = 4.0 was ~2.6x too narrow — mean descriptor cosine vs cv2 on
    # angle-paired keypoints 0.974 -> 0.990 on the parity frame).
    wgt = jnp.exp(-(gx_ ** 2 + gy_ ** 2) * (d + 1) ** 2 / (d * d))[None]
    w = mag * wgt

    def tri(binf, n, wrap):
        b0 = jnp.floor(binf)
        f = binf - b0
        b0i = b0.astype(jnp.int32)
        b1i = b0i + 1
        if wrap:
            b0i = jnp.mod(b0i, n)
            b1i = jnp.mod(b1i, n)
            m0 = jnp.ones_like(f)
            m1 = jnp.ones_like(f)
        else:
            m0 = ((b0i >= 0) & (b0i < n)).astype(w.dtype)
            m1 = ((b1i >= 0) & (b1i < n)).astype(w.dtype)
            b0i = jnp.clip(b0i, 0, n - 1)
            b1i = jnp.clip(b1i, 0, n - 1)
        oh0 = jax.nn.one_hot(b0i, n, dtype=w.dtype) * ((1 - f) * m0)[..., None]
        oh1 = jax.nn.one_hot(b1i, n, dtype=w.dtype) * (f * m1)[..., None]
        return oh0 + oh1  # (Q, g, g, n)

    R = tri(rbin, d, wrap=False)
    C = tri(cbin, d, wrap=False)
    O = tri(obin, _DESC_B, wrap=True)
    # structured contraction: spatial one-hot (R x C -> 16) against the
    # weighted orientation one-hot, one batched (16, g*g) @ (g*g, 8)
    # matmul — bounds the intermediate at (Q, g*g, 16) instead of the
    # 4-operand einsum's (Q, g*g, 128) materialization
    RC = (R[..., :, None] * C[..., None, :]).reshape(q, g * g, d * d)
    wO = (w[..., None] * O).reshape(q, g * g, _DESC_B)
    hist = jnp.einsum("qsm,qso->qmo", RC, wO,
                      precision=jax.lax.Precision.HIGHEST)
    desc = hist.reshape(q, d * d * _DESC_B)

    # normalize -> clip 0.2 -> renormalize
    nrm = jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12
    desc = jnp.minimum(desc / nrm, 0.2)
    nrm2 = jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12
    return desc / nrm2


def sift_detect_and_describe(img, cfg: SiftConfig = SiftConfig(),
                             upscale_first: bool = True,
                             select: str = "exact"):
    """Full SIFT on one grayscale image (H, W) float32 [0, 255].

    Returns the same static-shape dict contract as ORB, with "desc"
    (max_kpts, 128) float32 instead of binary "bits".

    select: extrema-quota selection mode ("exact" = full-sort lax.top_k,
    the default — approx_max_k MEASURED 1.7x slower on TPU at these
    shapes; "approx" = lax.approx_max_k) — static, see _detect_octave.
    """
    x = img.astype(jnp.float32) / 255.0
    h0, w0 = img.shape
    if upscale_first:
        base = jax.image.resize(x, (h0 * 2, w0 * 2), method="linear")
        base_scale = 0.5
        sig_diff = math.sqrt(max(_SIGMA0 ** 2 - (2 * _INIT_SIGMA) ** 2, 0.01))
    else:
        base = x
        base_scale = 1.0
        sig_diff = math.sqrt(max(_SIGMA0 ** 2 - _INIT_SIGMA ** 2, 0.01))
    base = _blur(base, sig_diff)

    k = 2.0 ** (1.0 / _S)
    # incremental sigmas between levels
    sig = [_SIGMA0]
    for i in range(1, _S + 3):
        prev = _SIGMA0 * (k ** (i - 1))
        total = prev * k
        sig.append(math.sqrt(total * total - prev * prev))

    quotas = _octave_quotas(cfg.max_kpts, cfg.noctaves)
    outs = []
    oct_img = base
    for o in range(cfg.noctaves):
        oh, ow = oct_img.shape
        if oh < 32 or ow < 32:
            break
        gauss = [oct_img]
        for i in range(1, _S + 3):
            gauss.append(_blur(gauss[-1], sig[i]))
        dogs = [gauss[i + 1] - gauss[i] for i in range(_S + 2)]

        xy, lay, scores, valid, kint = _detect_octave(
            gauss, dogs, quotas[o], select=select)
        xy = jnp.where(valid[:, None], xy, 16.0)
        scl = _SIGMA0 * (2.0 ** ((lay) / _S))  # octave coords scale

        # per-keypoint patch of the keypoint's own Gaussian layer
        # (layers 1.._S), matching cv2's calcOrientationHist /
        # calcSIFTDescriptor layer choice. Patch half-width 40 covers the
        # max descriptor radius (3 * scl_max * sqrt2 * 2.5 ~= 38.5 at
        # scl_max = 1.6 * 2^(3.5/3)); orientation (radius <= 16.2) reads
        # the same patch.
        gstack = jnp.stack([gauss[k] for k in range(1, _S + 1)], axis=0)
        li = jnp.clip(kint - 1, 0, _S - 1)
        Py, Px = min(80, oh), min(80, ow)
        patches, px0, py0 = _extract_patches(gstack, li, xy, Py, Px)
        ucx = xy[:, 0] - px0.astype(jnp.float32)
        ucy = xy[:, 1] - py0.astype(jnp.float32)
        # gradients once per octave, shared by orientation + descriptor
        gxp, gyp = _patch_grads(patches)

        theta1, theta2, has2 = _orientation(gxp, gyp, ucx, ucy, scl,
                                            valid)

        # secondary-orientation expansion (cv2 emits one keypoint per
        # histogram peak >= 0.8*max), then re-select the octave's static
        # quota by response — primaries win ties via an epsilon haircut on
        # the duplicate's score.
        q0 = xy.shape[0]
        xy2 = jnp.concatenate([xy, xy], axis=0)
        scl2 = jnp.concatenate([scl, scl], axis=0)
        li2 = jnp.concatenate([li, li], axis=0)
        lay2 = jnp.concatenate([lay, lay], axis=0)
        theta = jnp.concatenate([theta1, theta2], axis=0)
        valid2 = jnp.concatenate([valid, has2], axis=0)
        score2 = jnp.concatenate(
            [scores, jnp.where(has2, scores * (1.0 - 1e-6), 0.0)], axis=0)
        sel_score, sel = jax.lax.top_k(
            jnp.where(valid2, score2, 0.0), q0)
        xy = xy2[sel]
        scl = scl2[sel]
        li = li2[sel]
        lay = lay2[sel]
        theta = theta[sel]
        valid = sel_score > 0.0
        scores = sel_score

        # primary and secondary share the source keypoint's gradients
        pidx = sel % q0
        desc = _descriptor(gxp[pidx], gyp[pidx], ucx[pidx], ucy[pidx],
                           scl, theta)

        oct_scale = base_scale * (2.0 ** o)
        outs.append({
            "xy": xy * oct_scale,
            "angle": theta,
            "level": jnp.full((xy.shape[0],), o, jnp.int32),
            "score": scores,
            "desc": desc,
            "valid": valid,
        })
        # cv2 buildGaussianPyramid downsamples with INTER_NEAREST: plain
        # every-2nd-pixel decimation of the s-th Gaussian level (floor size).
        oct_img = gauss[_S][::2, ::2][: oh // 2, : ow // 2]

    res = {key: jnp.concatenate([u[key] for u in outs], axis=0)
           for key in outs[0]}
    n = res["xy"].shape[0]
    if n < cfg.max_kpts:
        pad = cfg.max_kpts - n
        res = {
            "xy": jnp.pad(res["xy"], ((0, pad), (0, 0))),
            "angle": jnp.pad(res["angle"], (0, pad)),
            "level": jnp.pad(res["level"], (0, pad)),
            "score": jnp.pad(res["score"], (0, pad)),
            "desc": jnp.pad(res["desc"], ((0, pad), (0, 0))),
            "valid": jnp.pad(res["valid"], (0, pad)),
        }
    else:
        res = {key: v[: cfg.max_kpts] for key, v in res.items()}
    return res
