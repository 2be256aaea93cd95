"""ORB feature detection + description, TPU-first (pure JAX/XLA).

Replaces `cv2.ORB_create(nfeatures, scaleFactor=1.1, nlevels=12,
fastThreshold=15, scoreType=ORB_HARRIS_SCORE).detectAndCompute`
(reference: src/core/pose_estimator.py:84-108) with a fixed-shape pipeline:

  1. 12-level x1.1 bilinear pyramid (ops/pyramid.py), packed into a single
     atlas image on the default path (ops/atlas.py);
  2. dense FAST-9 score -> 3x3 nonmax -> Harris ranking (one fused Pallas
     pass on TPU) -> per-level top-(static quota) selection. Quotas follow
     OpenCV's geometric per-level distribution of `nfeatures`;
  3. 31x31 patch extraction per keypoint (banded one-hot einsums on the
     atlas; dynamic-slice gathers on the legacy per-level path);
     intensity-centroid orientation on the unblurred image (IC_Angle
     semantics: circular mask of radius 15);
  4. steered BRIEF: a fixed 256-pair Gaussian pattern (radius <= 13,
     deterministic seed) rotated by the keypoint angle and sampled with
     nearest-neighbor from the 7x7/sigma-2 blurred level, giving one bit per
     pair. Bit-exactness with OpenCV's learned pattern is unattainable and
     not required — the parity contract is pose-level (SURVEY.md §7).

Outputs are static-size arrays (MAX_KPTS slots + validity mask) so the whole
detect -> match -> RANSAC -> pose path jits into one XLA program per image
shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import build_pyramid, gaussian_blur, level_shapes
from .fast import detect_level

PATCH_R = 15          # orientation circle radius (OpenCV HALF_PATCH_SIZE)
PATCH = 2 * PATCH_R + 1
PATTERN_R = 13        # max BRIEF pattern point radius (rotation-safe < 15)
EDGE_MARGIN = 19      # keypoint exclusion border (OpenCV internal EDGE_THRESHOLD)


def level_quotas(nfeatures: int, nlevels: int, scale_factor: float):
    """OpenCV ORB's geometric per-level feature quota (static ints)."""
    factor = 1.0 / scale_factor
    ndesired0 = nfeatures * (1.0 - factor) / (1.0 - factor ** nlevels)
    quotas, total = [], 0
    for l in range(nlevels - 1):
        q = int(round(ndesired0 * factor ** l))
        quotas.append(q)
        total += q
    quotas.append(max(nfeatures - total, 0))
    return quotas


def brief_pattern(n_pairs: int = 256, seed: int = 12345, kind: str = None):
    """BRIEF pattern: (n_pairs, 2, 2) int32 (x, y).

    kind (default: the RPE_BRIEF env var, else "gauss"):
      - "gauss": deterministic Gaussian pattern, points ~ N(0, (31/5)^2)
        clipped by rejection to radius <= PATTERN_R so any rotation keeps
        samples inside the 31x31 patch. Fixed seed makes the descriptor a
        stable format across processes/hosts. The framework default.
      - "cv2": OpenCV's learned sampling layout (brief_cv2_pattern.py,
        recovered empirically from the cv2 oracle) — descriptors become
        matchable against cv2-produced ones. 47/512 points have radius
        > 15; when rotation pushes one past the patch rim, sampling clamps
        to the rim (cv2 reads the full image there), costing a few bits of
        agreement at unlucky angles (see tests/test_fast_orb.py interop
        gate).
    """
    import os

    if kind is None:
        kind = os.environ.get("RPE_BRIEF", "gauss")
    return _brief_pattern_cached(n_pairs, seed, kind)


@functools.lru_cache(maxsize=None)
def _brief_pattern_cached(n_pairs: int, seed: int, kind: str):
    if kind == "cv2":
        from .brief_cv2_pattern import CV2_BRIEF_PATTERN

        pts = np.array(CV2_BRIEF_PATTERN, dtype=np.int32)
        assert pts.shape == (n_pairs, 4)
        return pts.reshape(n_pairs, 2, 2)
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < n_pairs * 2:
        cand = rng.normal(0.0, 31.0 / 5.0, size=(n_pairs * 4, 2))
        cand = np.round(cand).astype(np.int32)
        ok = (cand[:, 0] ** 2 + cand[:, 1] ** 2) <= PATTERN_R ** 2
        pts.extend([tuple(p) for p in cand[ok]])
    pts = np.array(pts[: n_pairs * 2], dtype=np.int32).reshape(n_pairs, 2, 2)
    return pts


@functools.lru_cache(maxsize=None)
def _ic_angle_masks():
    """Circular-region mask and (u, v) coordinate grids for IC_Angle.

    OpenCV's umax table (ORB::operator(), orb.cpp): round(sqrt(225 - v^2))
    for |v| <= floor(15/sqrt(2)) + 1, then SYMMETRIZED for larger |v| so
    the region is exactly mirror-equal under u<->v (the plain rounded
    circle drops 20 rim pixels at |v| in {13,14,15} and biases the angle
    by ~5 deg — measured against cv2 keypoint angles).
    Returns numpy (NOT jnp) so the lru_cache never captures jit tracers.
    """
    hp = PATCH_R
    umax = [0] * (hp + 2)
    vmax = int(np.floor(hp * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(hp * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(np.rint(np.sqrt(hp * hp - v * v)))
    v0 = 0
    for v in range(hp, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    u_max = np.array([umax[abs(v)] for v in range(-hp, hp + 1)])
    vs, us = np.mgrid[-PATCH_R:PATCH_R + 1, -PATCH_R:PATCH_R + 1]
    mask = np.abs(us) <= u_max[:, None]
    return (
        mask.astype(np.float32),
        us.astype(np.float32),
        vs.astype(np.float32),
    )


def gather_patches(img, xy):
    """img (H, W), xy (K, 2) float (x, y) int-valued -> (K, PATCH, PATCH).

    Keypoints are guaranteed >= EDGE_MARGIN > PATCH_R from the border.
    vmap(dynamic_slice) lowers to a gather of contiguous 2-D blocks, which
    the TPU executes orders of magnitude faster than the element-at-a-time
    gather produced by fancy indexing.
    """
    x0 = xy[:, 0].astype(jnp.int32) - PATCH_R
    y0 = xy[:, 1].astype(jnp.int32) - PATCH_R
    return jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(img, (y, x), (PATCH, PATCH))
    )(y0, x0)


def ic_angles(patches):
    """Intensity-centroid orientation per patch: atan2(m01, m10), radians."""
    mask_np, us_np, vs_np = _ic_angle_masks()
    mask, us, vs = jnp.asarray(mask_np), jnp.asarray(us_np), jnp.asarray(vs_np)
    w = patches * mask[None]
    m10 = jnp.sum(w * us[None], axis=(1, 2))
    m01 = jnp.sum(w * vs[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _brief_onehots(angles):
    """Rotated BRIEF sampling one-hots: (row_oh, col_oh), each (K, S, P)."""
    pat = jnp.asarray(brief_pattern(), dtype=jnp.float32)  # (256, 2, 2)
    ca, sa = jnp.cos(angles), jnp.sin(angles)              # (K,)
    px, py = pat[..., 0], pat[..., 1]                      # (256, 2)
    # rotate: x' = x cos - y sin ; y' = x sin + y cos  (per keypoint)
    rx = px[None] * ca[:, None, None] - py[None] * sa[:, None, None]
    ry = px[None] * sa[:, None, None] + py[None] * ca[:, None, None]
    # Clamp to the patch rim: a no-op for the default pattern (radius <=
    # PATTERN_R keeps every rotation in-grid) but required for the cv2
    # interop pattern, whose outer points can rotate past +-15 (cv2 reads
    # the full image there; the rim pixel is the closest available value).
    ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + PATCH_R, 0, PATCH - 1)
    iy = jnp.clip(jnp.round(ry).astype(jnp.int32) + PATCH_R, 0, PATCH - 1)
    k, s = ix.shape[0], 2 * ix.shape[1]
    grid = jnp.arange(PATCH)
    row_oh = (iy.reshape(k, s)[..., None] == grid).astype(jnp.float32)
    col_oh = (ix.reshape(k, s)[..., None] == grid).astype(jnp.float32)
    return row_oh, col_oh


def _brief_bits(vals, quant: bool | None = None):
    """quant=None reads the env gates — NOTE this happens at TRACE time
    (jit cache is keyed by callable identity, CLAUDE.md perf rule #7), so
    per-call control must pass `quant` explicitly, same contract as
    extract_windows_t_brief's `quant`."""
    import os

    k, s = vals.shape
    if quant is None:
        q = os.environ.get("RPE_BRIEF_QUANT")
        if q is None:
            # default: quantize in cv2-interop mode (OpenCV samples a
            # uint8 blurred image, so its bit comparisons happen on
            # QUANTIZED values — near-tie comparisons of our f32 blur are
            # coin flips against cv2's deterministic ones)
            q = "1" if os.environ.get("RPE_BRIEF") == "cv2" else ""
        quant = bool(q) and q != "0"
    if quant:
        # round the way saturate_cast does (half-to-even == jnp.round).
        # Measured on the interop frame: descriptor bit agreement vs cv2
        # 0.950 -> 0.983 (BFMatcher geometric consistency unchanged at
        # 0.93 — its residual is detector co-location, not bits).
        vals = jnp.round(vals)
    vals = vals.reshape(k, s // 2, 2)
    return (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)


def steered_brief(patches_blur, angles, quant: bool | None = None):
    """Rotated-pattern BRIEF bits.

    patches_blur: (K, PATCH, PATCH) from the Gaussian-blurred level.
    angles: (K,) radians. quant: see _brief_bits (None = env at trace
    time). Returns (K, 256) uint8 bits.

    Sampling the 512 rotated pattern points is expressed as two one-hot
    contractions on the MXU (sample = rowOH . patch . colOH) instead of the
    element-at-a-time gather TPUs execute poorly.
    """
    row_oh, col_oh = _brief_onehots(angles)
    # One-hot selection at HIGHEST precision: TPU DEFAULT truncates f32
    # inputs to single-pass bf16, quantizing the sampled pixel to 8
    # mantissa bits (see atlas.per_band_chunk — measured on hardware
    # 08-18); HIGHEST reproduces the f32 value exactly for 0/1 operands.
    tmp = jnp.einsum("ksy,kyx->ksx", row_oh, patches_blur,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)    # (K, S, P)
    vals = jnp.sum(tmp * col_oh, axis=-1)                    # (K, S)
    return _brief_bits(vals, quant=quant)


def steered_brief_t(patches_blur_t, angles, quant: bool | None = None):
    """steered_brief for TRANSPOSED patches (patch[u, v], u = x, v = y) as
    produced by ops/extract_pallas.extract_windows_t. Selects the exact
    same scalar per sample point (one-hot selection is exact in every
    contraction order), so the bits are bit-identical to
    steered_brief(patches, angles) with patches = transpose(patches_t)."""
    row_oh, col_oh = _brief_onehots(angles)
    # HIGHEST precision for the same exact-selection reason as
    # steered_brief (TPU DEFAULT would bf16-quantize the samples)
    tmp = jnp.einsum("ksx,kxy->ksy", col_oh, patches_blur_t,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)    # (K, S, P)
    vals = jnp.sum(tmp * row_oh, axis=-1)                    # (K, S)
    return _brief_bits(vals, quant=quant)


N_BRIEF_BINS = 30  # ORB paper §4.3: steering discretized to 2*pi/30


@functools.lru_cache(maxsize=None)
def brief_bin_tables(n_bins: int = N_BRIEF_BINS):
    """Static binned-steering lookup tables (ORB paper §4.3: "we
    discretize the angle to increments of 2*pi/30 and construct a lookup
    table of precomputed BRIEF patterns"; cv2's implementation rotates
    continuously — rpe_tpu's continuous path is the cv2 twin, this is the
    paper-canonical variant that makes the sampling one-hots STATIC so
    the extraction kernel batches slots through shared MXU contractions).

    Returns numpy (never jnp — lru_cache/tracer rule):
      ix_tab, iy_tab: (n_bins, 512) int32 — sample coords in [0, 30],
        column layout j-major (n = j*256 + k for pattern pair k, point j);
      uoh, voh: (n_bins*32, 512) float32 — the same coords one-hot over a
        32-row (padded-patch) axis, row-blocked by bin for kernel
        dynamic-slice lookup: uoh[b*32+u, n] = (u == ix_tab[b, n]).
    The rotation/round/clip chain mirrors _brief_onehots exactly (f32
    cos/sin products, round-half-even, clip to [0, 2*PATCH_R])."""
    pat = brief_pattern().astype(np.float32)                 # (256, 2, 2)
    th = (2.0 * np.pi / n_bins) * np.arange(n_bins)
    ca = np.cos(th).astype(np.float32)[:, None]              # (B, 1)
    sa = np.sin(th).astype(np.float32)[:, None]
    px = pat[:, :, 0].T.reshape(-1).astype(np.float32)[None]  # (1, 512)
    py = pat[:, :, 1].T.reshape(-1).astype(np.float32)[None]
    rx = px * ca - py * sa                                   # (B, 512) f32
    ry = px * sa + py * ca
    ix = np.clip(np.rint(rx).astype(np.int32) + PATCH_R, 0, 2 * PATCH_R)
    iy = np.clip(np.rint(ry).astype(np.int32) + PATCH_R, 0, 2 * PATCH_R)
    grid = np.arange(32, dtype=np.int32)
    uoh = (ix[:, None, :] == grid[None, :, None]).astype(np.float32)
    voh = (iy[:, None, :] == grid[None, :, None]).astype(np.float32)
    return (ix, iy,
            uoh.reshape(n_bins * 32, 512), voh.reshape(n_bins * 32, 512))


@functools.lru_cache(maxsize=None)
def brief_bin_vectors(n_bins: int = N_BRIEF_BINS):
    """(cos, sin) of the bin centers, f32 numpy (n_bins,)."""
    th = (2.0 * np.pi / n_bins) * np.arange(n_bins)
    return np.cos(th).astype(np.float32), np.sin(th).astype(np.float32)


def angle_bins(m10, m01, n_bins: int = N_BRIEF_BINS):
    """Nearest steering bin from raw IC moments, branch-free.

    argmax_b (m10 cos th_b + m01 sin th_b) == the bin whose center is
    angularly nearest atan2(m01, m10) (the dot with a unit direction is
    |m| cos(dtheta)); first-match tie-break; (0, 0) moments -> bin 0
    (cos=1, sin=0 — the same convention as the kernels' ca/sa fallback).
    The op chain (f32 multiply-add, >=max compare, min-index) mirrors the
    v7 Pallas kernel exactly so bin choices agree bit-for-bit."""
    cosb, sinb = brief_bin_vectors(n_bins)
    dots = (m10[:, None] * jnp.asarray(cosb)[None]
            + m01[:, None] * jnp.asarray(sinb)[None])        # (K, B)
    mx = jnp.max(dots, axis=1, keepdims=True)
    idx = jnp.where(dots >= mx, jnp.arange(n_bins, dtype=jnp.int32), 127)
    return jnp.min(idx, axis=1)                              # (K,) int32


def steered_brief_t_binned(patches_blur_t, m10, m01,
                           quant: bool | None = None):
    """XLA twin of the v7 binned-steering extraction kernel: bits from
    TRANSPOSED blur patches with the ORB-paper 30-bin quantized steering
    (static tables from brief_bin_tables; bin choice from raw moments via
    angle_bins). Bit-identical to the kernel wherever the f32 bin dots
    agree (the sampling itself is an exact one-hot selection)."""
    ix_tab, iy_tab, _, _ = brief_bin_tables()
    b = angle_bins(m10, m01)
    ix = jnp.asarray(ix_tab)[b]                              # (K, 512)
    iy = jnp.asarray(iy_tab)[b]
    grid = jnp.arange(32)
    col_oh = (ix[..., None] == grid).astype(jnp.float32)     # (K, 512, 32)
    row_oh = (iy[..., None] == grid).astype(jnp.float32)
    pt = patches_blur_t
    if pt.shape[-1] != 32:                                   # pad 31 -> 32
        pt = jnp.pad(pt, ((0, 0), (0, 32 - pt.shape[1]),
                          (0, 32 - pt.shape[2])))
    tmp = jnp.einsum("ksx,kxy->ksy", col_oh, pt,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    vals = jnp.sum(tmp * row_oh, axis=-1)                    # (K, 512)
    if quant is None:
        import os

        q = os.environ.get("RPE_BRIEF_QUANT")
        if q is None:
            q = "1" if os.environ.get("RPE_BRIEF") == "cv2" else ""
        quant = bool(q) and q != "0"
    if quant:
        vals = jnp.round(vals)
    return (vals[:, :256] < vals[:, 256:]).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _atlas_valid_mask(offsets, total: int, wp: int, shapes, margin: int):
    """Static (HA, WP) mask: True inside each level's interior margin."""
    mask = np.zeros((total, wp), dtype=bool)
    for (off, lh, lw), _ in zip(offsets, shapes):
        if lh > 2 * margin and lw > 2 * margin:
            mask[off + margin: off + lh - margin,
                 margin: lw - margin] = True
    return mask


def orb_detect_and_describe_atlas(
    img,
    nfeatures: int = 4000,
    nlevels: int = 12,
    scale_factor: float = 1.1,
    fast_threshold: float = 15.0,
    max_kpts: int = 4096,
    extract_cap: int | None = None,
    band: int | None = None,
):
    """Atlas-based ORB: one rank-map pass, one blur, one banded patch
    extraction for the whole pyramid (see ops/atlas.py). Output contract is
    identical to `orb_detect_and_describe` except keypoint ordering (which
    nothing downstream depends on — matching is by descriptor)."""
    import os

    from .atlas import banded_extract, build_atlas, build_atlas_fused, \
        gaussian_blur_rolled
    from .fast import _use_pallas, fast_score_map, harris_response_map, \
        nonmax_suppress_3x3
    from .pyramid import level_shapes

    h, w = img.shape
    quotas = level_quotas(nfeatures, nlevels, scale_factor)
    if os.environ.get("RPE_NO_FUSED_ATLAS"):
        levels = build_pyramid(img, nlevels, scale_factor)
        atlas, (offsets, total, wp) = build_atlas(
            levels, h, w, nlevels, scale_factor)
    else:
        atlas, (offsets, total, wp) = build_atlas_fused(
            img, nlevels, scale_factor)

    if _use_pallas():
        from .fast_pallas import fast_harris_rank_map

        rank, blurred = fast_harris_rank_map(atlas, float(fast_threshold))
    else:
        score = nonmax_suppress_3x3(fast_score_map(atlas, fast_threshold))
        rank = jnp.where(score > 0.0, harris_response_map(atlas), -jnp.inf)
        blurred = gaussian_blur_rolled(atlas)

    shapes = tuple(level_shapes(h, w, nlevels, scale_factor))
    mask = _atlas_valid_mask(tuple(offsets), total, wp, shapes, EDGE_MARGIN)
    rank = jnp.where(jnp.asarray(mask), rank, -jnp.inf)

    xs_a, ys_a, xs_b, lvls, scores, valids = [], [], [], [], [], []
    for l, ((off, lh, lw), quota) in enumerate(zip(offsets, quotas)):
        if quota <= 0 or lh <= 2 * EDGE_MARGIN or lw <= 2 * EDGE_MARGIN:
            continue
        sub = jax.lax.dynamic_slice_in_dim(rank, off, lh, axis=0)
        vals, flat = jax.lax.approx_max_k(sub.reshape(-1), quota)
        vy = (flat // wp).astype(jnp.float32)
        vx = (flat % wp).astype(jnp.float32)
        valid = vals > -jnp.inf
        vy = jnp.where(valid, vy, jnp.float32(EDGE_MARGIN))
        vx = jnp.where(valid, vx, jnp.float32(EDGE_MARGIN))
        scale = scale_factor ** l
        xs_a.append(jnp.stack([vx, vy + off], axis=-1))      # atlas coords
        xs_b.append(jnp.stack([vx, vy], axis=-1) * scale)    # base coords
        lvls.append(jnp.full((quota,), l, jnp.int32))
        scores.append(vals)
        valids.append(valid)

    xy_atlas = jnp.concatenate(xs_a, axis=0)
    xy_base = jnp.concatenate(xs_b, axis=0)
    level = jnp.concatenate(lvls, axis=0)
    score = jnp.concatenate(scores, axis=0)
    valid = jnp.concatenate(valids, axis=0)
    n = xy_atlas.shape[0]
    if n < max_kpts:
        pad = max_kpts - n
        xy_atlas = jnp.pad(xy_atlas, ((0, pad), (0, 0)),
                           constant_values=EDGE_MARGIN)
        xy_base = jnp.pad(xy_base, ((0, pad), (0, 0)))
        level = jnp.pad(level, (0, pad))
        score = jnp.pad(score, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    else:
        xy_atlas, xy_base = xy_atlas[:max_kpts], xy_base[:max_kpts]
        level, score, valid = level[:max_kpts], score[:max_kpts], valid[:max_kpts]

    ext = banded_extract(atlas, blurred, xy_atlas, valid, patch=PATCH,
                         cap=extract_cap, band=band)

    if ext.get("m10") is not None:
        # moments computed in the extraction kernel (RPE_EXTRACT_MOMENTS)
        angle_slots = jnp.arctan2(ext["m01"], ext["m10"])
    else:
        angle_slots = ic_angles(ext["patches_raw"])
    if ext.get("bits") is not None:
        # descriptors computed in the extraction kernel (RPE_EXTRACT_T_BRIEF)
        bits_slots = ext["bits"]
    elif ext.get("patches_blur_t") is not None:
        # transposed patches from extract_windows_t (RPE_EXTRACT_T)
        bits_slots = steered_brief_t(ext["patches_blur_t"], angle_slots)
    else:
        bits_slots = steered_brief(ext["patches_blur"], angle_slots)

    order = ext["order"]
    slot = ext["slot_of_sorted"]
    return {
        "xy": jnp.take(xy_base, order, axis=0),
        "angle": jnp.take(angle_slots, slot),
        "level": jnp.take(level, order),
        "score": jnp.take(score, order),
        "bits": jnp.take(bits_slots, slot, axis=0),
        "valid": ext["valid_sorted"],
    }


def orb_detect_and_describe(
    img,
    nfeatures: int = 4000,
    nlevels: int = 12,
    scale_factor: float = 1.1,
    fast_threshold: float = 15.0,
    max_kpts: int = 4096,
    use_atlas: bool = True,
    extract_cap: int | None = None,
    band: int | None = None,
):
    """Full ORB on one grayscale image (H, W) float32 [0, 255].

    Returns dict of fixed-shape arrays:
      xy:     (max_kpts, 2) float32 — (x, y) in level-0 pixel coords
      angle:  (max_kpts,)  float32 — orientation, radians
      level:  (max_kpts,)  int32
      score:  (max_kpts,)  float32 — Harris response (ranking score)
      bits:   (max_kpts, 256) uint8 — descriptor bits
      valid:  (max_kpts,)  bool
    """
    import os

    if use_atlas and not os.environ.get("RPE_NO_ATLAS"):
        return orb_detect_and_describe_atlas(
            img, nfeatures=nfeatures, nlevels=nlevels,
            scale_factor=scale_factor, fast_threshold=fast_threshold,
            max_kpts=max_kpts, extract_cap=extract_cap, band=band)
    quotas = level_quotas(nfeatures, nlevels, scale_factor)
    levels = build_pyramid(img, nlevels, scale_factor)

    xs, angs, lvls, scores, bits, valids = [], [], [], [], [], []
    for l, (lvl_img, quota) in enumerate(zip(levels, quotas)):
        if quota <= 0:
            continue
        h, w = lvl_img.shape
        if h <= 2 * EDGE_MARGIN + 1 or w <= 2 * EDGE_MARGIN + 1:
            continue
        xy, harris, valid = detect_level(
            lvl_img, fast_threshold, EDGE_MARGIN, quota
        )
        # Invalid slots hold flat-index 0 -> (0,0); clamp into the safe
        # interior so patch gathers stay in bounds (they are masked out).
        xy = jnp.where(valid[:, None], xy, jnp.float32(EDGE_MARGIN))
        patches = gather_patches(lvl_img, xy)
        ang = ic_angles(patches)
        blurred = gaussian_blur(lvl_img)
        patches_b = gather_patches(blurred, xy)
        b = steered_brief(patches_b, ang)

        scale = scale_factor ** l
        xs.append(xy * scale)
        angs.append(ang)
        lvls.append(jnp.full((quota,), l, dtype=jnp.int32))
        scores.append(harris)
        bits.append(b)
        valids.append(valid)

    xy = jnp.concatenate(xs, axis=0)
    angle = jnp.concatenate(angs, axis=0)
    level = jnp.concatenate(lvls, axis=0)
    score = jnp.concatenate(scores, axis=0)
    desc = jnp.concatenate(bits, axis=0)
    valid = jnp.concatenate(valids, axis=0)

    n = xy.shape[0]
    if n < max_kpts:
        pad = max_kpts - n
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        angle = jnp.pad(angle, (0, pad))
        level = jnp.pad(level, (0, pad))
        score = jnp.pad(score, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    else:
        xy, angle, level = xy[:max_kpts], angle[:max_kpts], level[:max_kpts]
        score, desc, valid = score[:max_kpts], desc[:max_kpts], valid[:max_kpts]

    return {
        "xy": xy, "angle": angle, "level": level,
        "score": score, "bits": desc, "valid": valid,
    }
