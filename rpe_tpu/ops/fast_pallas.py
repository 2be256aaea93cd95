"""Fused FAST-9 + Harris + nonmax Pallas kernel.

The XLA formulation in ops/fast.py materializes ~40 full-image intermediates
(16 neighbor planes, run masks, gradient products, box sums) in HBM. This
kernel streams the image once: each grid step DMAs an 18-row window into
VMEM and produces an 8-row block of the final *rank map*
(harris response where a FAST corner survives 3x3 nonmax, -inf elsewhere) —
the exact input `detect_level`'s top-k consumes.

Layout: grid over row tiles, full image width per tile (KITTI-width rows
pad to the 128-lane boundary). All shifts are static row slices + lane
rolls, so everything stays in vector registers/VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from .fast import _CIRCLE

HALO = 5            # 4 (harris: 3 box + 1 gradient) + 1 (nonmax)


def _tile_rows(wp: int) -> int:
    """Largest 8-multiple tile that keeps the kernel inside scoped VMEM.

    The 16 circle planes + harris intermediates scale with tile*wp; 32 rows
    x 1280 lanes fits v5e's 16 MB, 32x1920 does not (measured OOM on the
    1920-wide salah atlas)."""
    budget = 32 * 1280
    return max((budget // wp) // 8 * 8, 8)


_GAUSS7 = None


def _gauss7():
    global _GAUSS7
    if _GAUSS7 is None:
        x = np.arange(-3, 4, dtype=np.float64)
        k = np.exp(-(x * x) / (2.0 * 2.0 * 2.0))
        _GAUSS7 = tuple(float(v) for v in (k / k.sum()))
    return _GAUSS7


def _fast_harris_kernel(threshold, k_harris, tile, prev_ref, cur_ref,
                        next_ref, out_ref, blur_ref):
    # prev/cur/next: three consecutive TILE_ROWS x W VMEM blocks of the
    # padded image (the same array bound three times with index maps i,
    # i+1, i+2) — a halo without overlapping block windows, which the
    # Mosaic lowering does not support. The 18-row compute window sits
    # centered inside the 3-tile stack.
    x = jnp.concatenate([prev_ref[:], cur_ref[:], next_ref[:]], axis=0)
    in_rows = tile + 2 * HALO
    x = x[tile - HALO: tile - HALO + in_rows, :]

    # Lane rolls are the dominant VPU cost in this kernel (each is a
    # cross-lane relayout of a full tile): pre-roll the window once per
    # distinct dx in the Bresenham circle (6 rolls) and serve all 14
    # dx != 0 circle neighbors and both horizontal gradients as free row
    # slices of these planes.
    x_dx = {0: x}
    for dx in (-3, -2, -1, 1, 2, 3):
        x_dx[dx] = pltpu.roll(x, (-dx) % x.shape[1], axis=1)

    def shifted(dy, dx, y0, rows):
        return x_dx[dx][y0 + dy: y0 + dy + rows, :]

    # --- FAST score on TILE_ROWS + 2 rows (nonmax halo), centered at HALO-1
    s_rows = tile + 2
    y0 = HALO - 1
    center = x[y0: y0 + s_rows, :]
    # The 16 bright/dark masks pack into ONE int32 plane per polarity
    # (bit i = neighbor i); the ">= 9 contiguous" log-doubling then runs
    # on packed bits (4 int ops per rotation) instead of 16 boolean planes
    # per stage — ~50 fewer VPU ops/px, boolean-exact (corner set is
    # bit-identical to the unpacked formulation). The margin score uses
    # where(d > t, d - t, 0) == max(d - t, 0): a > b implies fl(a-b) > 0
    # in f32, so the forms are exactly equal.
    packed_b = None
    packed_d = None
    score_b = jnp.zeros_like(center)
    score_d = jnp.zeros_like(center)
    for i, (dx, dy) in enumerate(_CIRCLE):
        nb = shifted(dy, dx, y0, s_rows)
        d = nb - center
        score_b = score_b + jnp.maximum(d - threshold, 0.0)
        score_d = score_d + jnp.maximum(-d - threshold, 0.0)
        bit_b = jnp.where(d > threshold, jnp.int32(1 << i), jnp.int32(0))
        bit_d = jnp.where(d < -threshold, jnp.int32(1 << i), jnp.int32(0))
        packed_b = bit_b if packed_b is None else (packed_b | bit_b)
        packed_d = bit_d if packed_d is None else (packed_d | bit_d)

    def run_ge9_packed(m):
        def rot(v, s):
            # circular left-rotation of the low 16 bits
            return ((v << s) | (v >> (16 - s))) & 0xFFFF
        s2 = m & rot(m, 1)
        s4 = s2 & rot(s2, 2)
        s8 = s4 & rot(s4, 4)
        s9 = s8 & rot(m, 8)
        return s9 != 0

    is_corner = run_ge9_packed(packed_b) | run_ge9_packed(packed_d)
    fast_score = jnp.where(is_corner, jnp.maximum(score_b, score_d), 0.0)

    # --- Harris response on the TILE_ROWS output rows
    # gradient products on TILE_ROWS + 6 rows (box halo 3)
    g_rows = tile + 6
    gy0 = HALO - 3
    gx = (shifted(0, -1, gy0, g_rows) - shifted(0, 1, gy0, g_rows))
    gy = (shifted(-1, 0, gy0, g_rows) - shifted(1, 0, gy0, g_rows))
    axx = gx * gx
    ayy = gy * gy
    axy = gx * gy

    def box7(v):
        # 7x7 box sum: 7 row-slices, then the 7 horizontal taps by
        # log-doubling (5 rolls + 3 adds instead of 6 rolls + 6 adds;
        # reorders f32 adds — harris is a ranking score with a 1e-3
        # relative parity gate, not a bit-exact one)
        rowsum = jnp.zeros((tile, v.shape[1]), v.dtype)
        for dy in range(-3, 4):
            rowsum = rowsum + v[3 + dy: 3 + dy + tile, :]

        def sh(a, s):
            return pltpu.roll(a, (-s) % a.shape[1], axis=1)

        a2 = rowsum + sh(rowsum, 1)          # taps {0, 1}
        a4 = a2 + sh(a2, 2)                  # taps {0..3}
        a7 = a4 + sh(a2, 4) + sh(rowsum, 6)  # taps {0..6}
        return sh(a7, -3)                    # recenter to {-3..3}

    a = box7(axx)
    b_ = box7(ayy)
    c = box7(axy)
    harris = (a * b_ - c * c) - k_harris * (a + b_) ** 2

    # --- 3x3 nonmax on the FAST score (score has 1-row halo); max is
    # separable: vertical max over the three row slices (free), then two
    # lane rolls instead of six
    vmax = jnp.maximum(jnp.maximum(fast_score[0: tile, :],
                                   fast_score[1: 1 + tile, :]),
                       fast_score[2: 2 + tile, :])
    neighborhood_max = jnp.maximum(
        jnp.maximum(vmax, pltpu.roll(vmax, 1, axis=1)),
        pltpu.roll(vmax, vmax.shape[1] - 1, axis=1))
    score_c = fast_score[1: 1 + tile, :]
    keep = (score_c >= neighborhood_max) & (score_c > 0.0)

    out_ref[:] = jnp.where(keep, harris, -jnp.inf)

    # --- fused 7x7 sigma=2 Gaussian blur (descriptor sampling image):
    # vertical taps from the halo rows, horizontal taps as lane rolls
    kg = _gauss7()
    vert = None
    for i, kv in enumerate(kg):
        v = x[HALO - 3 + i: HALO - 3 + i + tile, :] * kv
        vert = v if vert is None else vert + v
    blur = None
    for i, kv in enumerate(kg):
        sh = i - 3
        v = (pltpu.roll(vert, (-sh) % vert.shape[1], axis=1)
             if sh else vert) * kv
        blur = v if blur is None else blur + v
    blur_ref[:] = blur


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_harris_rank_map(img, threshold: float = 15.0, k_harris: float = 0.04,
                         interpret: bool = False):
    """Fused rank map + Gaussian-blurred image for one (H, W) float32 image.

    Returns (rank, blurred), both (H, W): harris response at surviving FAST
    corners (-inf elsewhere), and the 7x7 sigma=2 blur used for descriptor
    sampling — emitted from the same single pass over the image. Rows are
    processed in TILE_ROWS blocks with a replicated-edge halo; columns wrap
    (masked by the caller's border margin).
    """
    h, w = img.shape
    # pad width to the 128-lane boundary, height to a tile multiple plus one
    # full tile of edge padding on each side (the prev/next halo blocks)
    wp = -(-w // 128) * 128
    tile = _tile_rows(wp)
    hp = -(-h // tile) * tile
    padded = jnp.pad(
        img, ((tile, hp - h + tile), (0, wp - w)), mode="edge")

    grid = (hp // tile,)
    block = pl.BlockSpec((tile, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    block_next = pl.BlockSpec((tile, wp), lambda i: (i + 1, 0),
                              memory_space=pltpu.VMEM)
    block_next2 = pl.BlockSpec((tile, wp), lambda i: (i + 2, 0),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, wp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rank, blur = pl.pallas_call(
        functools.partial(_fast_harris_kernel, float(threshold),
                          float(k_harris), tile),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.float32)),
        grid=grid,
        in_specs=[block, block_next, block_next2],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(padded, padded, padded)
    return rank[:h, :w], blur[:h, :w]
