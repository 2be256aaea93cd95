"""FAST-9/16 corner detection + Harris response as dense vectorized maps.

TPU-native equivalent of the FAST detector + Harris scoring inside OpenCV's
ORB (reference: src/core/pose_estimator.py:84-91, fastThreshold=15,
scoreType=ORB_HARRIS_SCORE). Instead of OpenCV's per-pixel branchy scan,
the whole image is processed as 16 shifted planes on the VPU:

  * circle test: bright/dark masks for all 16 Bresenham-circle neighbors;
  * ">= 9 contiguous" via log-doubling AND of circularly shifted masks
    (5 boolean ops instead of a 16x9 window scan);
  * FAST score: max margin sum over the bright/dark arcs (used only for
    3x3 nonmax suppression, as in OpenCV's two-stage retain);
  * Harris: central-difference gradients + 7x7 box sums, k = 0.04
    (OpenCV HarrisResponses uses blockSize 7) — final ranking score.

Everything is branch-free elementwise math: XLA fuses the full stack into a
couple of passes over the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import box_filter

# Bresenham circle of radius 3 (OpenCV FAST-16 order, clockwise from 12
# o'clock): (dx, dy) with y down.
_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], dtype=np.int32)


def _shifted_stack(img):
    """(16, H, W): neighbor intensity planes. Border pixels wrap (jnp.roll);
    callers mask a >= 3 px border so wrapped values never count."""
    planes = [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dx, dy in _CIRCLE]
    return jnp.stack(planes, axis=0)


def _circular_run_ge9(b):
    """b: (16, H, W) bool -> (H, W) bool: any circular run of >= 9 set bits.

    S_m[k] = AND of b[k..k+m-1] built by log-doubling:
    S_2 = b & rot(b,1); S_4 = S_2 & rot(S_2,2); S_8 = S_4 & rot(S_4,4);
    S_9 = S_8 & rot(b,8); corner iff any k has S_9[k].
    """
    def rot(x, s):
        return jnp.roll(x, -s, axis=0)

    s2 = b & rot(b, 1)
    s4 = s2 & rot(s2, 2)
    s8 = s4 & rot(s4, 4)
    s9 = s8 & rot(b, 8)
    return jnp.any(s9, axis=0)


def fast_score_map(img, threshold: float = 15.0):
    """Dense FAST corner score map.

    img: (H, W) float32. Returns (H, W) float32 — 0 where not a corner,
    else the arc-margin score used for nonmax suppression (sum of
    |diff| - t over the stronger of the bright/dark sets; OpenCV's
    cornerScore is the same quantity maximized differently — only the
    3x3-local ranking matters downstream).
    """
    nb = _shifted_stack(img)                    # (16, H, W)
    diff = nb - img[None]
    bright = diff > threshold
    dark = diff < -threshold
    is_corner = _circular_run_ge9(bright) | _circular_run_ge9(dark)
    score_b = jnp.sum(jnp.where(bright, diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(dark, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)
    return jnp.where(is_corner, score, 0.0)


def nonmax_suppress_3x3(score):
    """Keep only 3x3-local maxima of a nonnegative score map."""
    neg = -score
    m = -jax.lax.reduce_window(
        neg, jnp.inf, jax.lax.min, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= m) & (score > 0.0), score, 0.0)


def harris_response_map(img, block_size: int = 7, k: float = 0.04):
    """Dense Harris corner response (OpenCV ORB HarrisResponses semantics).

    Central-difference gradients, block_size x block_size box sums of the
    gradient products, R = det(M) - k * trace(M)^2. Absolute scaling differs
    from OpenCV's fixed-point scale factor; ranking (all that is used) is
    identical.
    """
    dx = (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    dy = (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    a = box_filter(dx * dx, block_size)
    b = box_filter(dy * dy, block_size)
    c = box_filter(dx * dy, block_size)
    return (a * b - c * c) - k * (a + b) ** 2


def border_mask(h: int, w: int, margin: int):
    """(h, w) bool: True where a keypoint is allowed (static margins)."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)


def _use_pallas() -> bool:
    import os

    if os.environ.get("RPE_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# Pallas kernel families that have cleared hardware validation on the real
# chip (.scratch/validate_kernels_tpu.py, 2026-08-18 run: bit-agreement
# 1.00000 vs the XLA formulations for 5PT / MATCH / EXTRACT / MOMENTS /
# EXTRACT_T3 / T_BRIEF3, plus the dataset-level "T_BRIEF3 CSV-AB PASS"
# simulator A/B). These are ON by default wherever `_use_pallas()` holds;
# set the env var to "0"/"off" to fall back to the XLA path. Unvalidated
# or behavior-changing gates (RPE_BRIEF, RPE_VP_DEVICE, RPE_ONEHOT_BF16)
# stay opt-in and are NOT routed through this helper.
_VALIDATED_KERNEL_GATES = frozenset({
    "RPE_PALLAS_5PT",
    "RPE_PALLAS_EXTRACT",
    "RPE_PALLAS_MATCH",
    "RPE_EXTRACT_T",
    "RPE_EXTRACT_T_BRIEF",
    "RPE_EXTRACT_MOMENTS",
    # v6 quad: hardware-validated bit-agreement 1.00000 at band=8 (08-20,
    # T_QUAD + T_QUAD_NB4 PASS) and the measured winner at the band=32
    # production default (interleaved A/B 08-20: b32c72 quad 3.459 vs
    # b8c24 v3 3.607 ms/image full detect; v3's masked accumulate grows
    # 4x at band=32 and its cap>=72 outputs blow scoped VMEM) — the
    # validation chain's band-32 sections guard it per host
    # (.scratch/validate_kernels_tpu.py T_QUAD_B32*).
    "RPE_EXTRACT_T_QUAD",
})

_GATE_OFF = ("", "0", "off", "false", "no")


def kernel_gate(name: str) -> bool:
    """True iff the named Pallas kernel gate is enabled.

    Unset -> the hardware-validated default (on for every name in
    `_VALIDATED_KERNEL_GATES`, off otherwise). Set -> explicit operator
    choice: "", "0", "off", "false", "no" disable; anything else enables.
    NOTE (CLAUDE.md jit-cache hazard): calls from inside jitted functions
    are baked at first trace — flip gates before the first call.
    """
    import os

    v = os.environ.get(name)
    if v is None:
        return name in _VALIDATED_KERNEL_GATES
    return v.strip().lower() not in _GATE_OFF


def extract_nbody(band: int = 8) -> int:
    """Bands served per grid step by the transposed extraction kernels
    (extract_pallas.extract_windows_t / _t_brief `nbody`). One VMEM
    transpose serves nbody bands, cutting the kernels' in-kernel staging
    (docs/PERF_LOG.md round 4); values are bit-identical for any setting.
    Env RPE_EXTRACT_T_NBODY in {1, 2, 4}; default 4 — hardware-validated
    08-19 ("T_BRIEF3_NB4 PASS", bit-agreement 1.00000) and the fastest
    measured variant (full detect 3.773 -> 3.608 ms/image at parity).
    Same trace-time-baking hazard as kernel_gate.
    """
    import os

    # transpose packing constraint: 2 planes x (band*nbody + 32) rows
    # must fit 128 lanes -> band * nbody <= 32 (pooled banding, round 5:
    # band=32 forces nbody=1 — one transpose already serves 32 atlas
    # rows, the same span nbody=4 covered at band=8)
    cap_n = max(32 // int(band), 1)
    v = os.environ.get("RPE_EXTRACT_T_NBODY", "").strip()
    try:
        n = int(v) if v else 4
    except ValueError:
        return min(4, cap_n)
    if n not in (1, 2, 4):
        n = 1 if n <= 1 else 4       # "0"/off -> single-band fallback
    return min(n, cap_n)


def detect_level(img, threshold: float, margin: int, quota: int):
    """FAST + nonmax + Harris top-`quota` selection on one pyramid level.

    Returns (xy, harris, valid):
      xy:     (quota, 2) float32 (x, y) level-local pixel coords
      harris: (quota,) float32 Harris responses (ranking score)
      valid:  (quota,) bool

    On TPU the dense FAST+Harris+nonmax stack runs as one fused Pallas
    kernel (ops/fast_pallas.py); elsewhere the XLA formulation below is
    used (bit-equivalent; tested against each other).
    """
    h, w = img.shape
    if _use_pallas():
        from .fast_pallas import fast_harris_rank_map

        rank2d, _ = fast_harris_rank_map(img, float(threshold))
    else:
        score = fast_score_map(img, threshold)
        score = nonmax_suppress_3x3(score)
        harris = harris_response_map(img)
        rank2d = jnp.where(score > 0.0, harris, -jnp.inf)
    rank2d = jnp.where(border_mask(h, w, margin), rank2d, -jnp.inf)

    # Rank surviving corners by Harris response (ORB_HARRIS_SCORE).
    # approx_max_k uses the TPU's hardware-accelerated partial-reduce
    # top-k (recall ~0.95); which marginal corners make the cut is
    # immaterial, and exact top_k over H*W is a major serial bottleneck.
    rank = rank2d.reshape(-1)
    vals, flat_idx = jax.lax.approx_max_k(rank, quota)
    ys = (flat_idx // w).astype(jnp.float32)
    xs = (flat_idx % w).astype(jnp.float32)
    valid = vals > -jnp.inf
    xy = jnp.stack([xs, ys], axis=-1)
    return xy, vals, valid
