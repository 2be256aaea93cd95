"""Pallas banded patch extraction: one-hot selection built in VMEM.

The XLA formulation in ops/atlas.banded_extract materializes its column
one-hot operand in HBM — ~1.4 GB of operand traffic per image at the bench
shape, making extraction the largest single block of the detect budget
(2.37 ms/image of 4.7, docs/PERF_LOG.md round-2 stage budget). This kernel
builds the one-hot in VMEM scratch per band, runs the same lane-selection
matmul MXU-resident, and row-selects each keypoint with a dynamic sublane
slice — HBM traffic drops to the windows + patches themselves.

Replaces only the window-selection math; banding, CAP-slot assignment and
ordering stay in ops/atlas.py (shared with the XLA fallback path), so the
outputs are bit-identical — PROVIDED the selection contractions run at
HIGHEST precision: on TPU both XLA's and Mosaic's default f32 matmul is a
single bf16 pass, which quantizes every selected pixel to 8 mantissa bits
(measured on hardware 08-18; preferred_element_type only sets the
accumulator type).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .atlas import BAND, WIN

_PP = 32          # padded patch edge (31 -> 32 lanes per keypoint slot)
PATCH_R = 15      # orientation/descriptor patch radius (== orb.PATCH_R)


def _extract_kernel(win_ref, x0v_ref, ry_ref, raw_ref, blur_ref):
    # win_ref: (1, 2*WIN, WP) — rows 0:WIN raw, WIN:2*WIN blurred
    # x0v_ref: (1, 1, CAP*_PP) int32 column starts per slot lane (dead =
    #          -1e6); 3-D so the VMEM block's trailing two dims (1, CAP*_PP)
    #          match the array dims (Mosaic rejects a (1, lanes) block over
    #          a (NB, lanes) array: sublane block 1 is neither 8-divisible
    #          nor equal to NB)
    # ry_ref:  (1, 1, CAP) int32 in SMEM — window-relative row start per
    #          slot; 3-D for the same trailing-dims rule (it applies to
    #          SMEM blocks with non-trivial windows too)
    wp = win_ref.shape[2]
    cap = ry_ref.shape[2]            # slots per band (static block shape)
    win = win_ref.shape[1] // 2      # band + 32 (runtime band knob)
    band = win - 32
    w = win_ref[0]                                       # (2*WIN, WP)
    x0v = x0v_ref[0, 0]                                  # (CAP*_PP,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (wp, cap * _PP), 0)
    col = (rows == x0v[None, :]).astype(jnp.float32)     # (WP, CAP*_PP)
    # HIGHEST: Mosaic's default f32 dot is single-pass bf16 (hardware
    # bit-agreement 0.98327 on 08-18 — preferred_element_type only sets
    # the accumulator); HIGHEST makes the one-hot selection exact, as it
    # provably does for the T_BRIEF sampling dot (1.00000 same run)
    t = jnp.dot(w, col, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (2W, CAP*_PP)
    raws, blurs = [], []
    for c in range(cap):
        # row select by 8-way masked accumulate over STATIC slices: Mosaic
        # rejects dynamic sublane starts on partial-lane (32-lane) vectors
        # ("cannot statically prove index is a multiple of 8", measured
        # 08-18) — the same pattern _t_extract_slots compiles with. Parked
        # slots carry rel_y <= 0 outside 1..BAND-1 and simply accumulate
        # nothing past r=0 (their outputs are masked invalid downstream).
        ry = ry_ref[0, 0, c]
        raw = jnp.zeros((_PP, _PP), jnp.float32)
        blur = jnp.zeros((_PP, _PP), jnp.float32)
        for r in range(band):
            sel = (ry == r).astype(jnp.float32)
            raw = raw + sel * jax.lax.slice(
                t, (r, c * _PP), (r + _PP, (c + 1) * _PP))
            blur = blur + sel * jax.lax.slice(
                t, (win + r, c * _PP), (win + r + _PP, (c + 1) * _PP))
        raws.append(raw)
        blurs.append(blur)
    raw_ref[0] = jnp.concatenate(raws, axis=1)
    blur_ref[0] = jnp.concatenate(blurs, axis=1)


def _extract_moments_kernel(win_ref, x0v_ref, mu_ref, mv_ref, ry_ref,
                            blur_ref, m10_ref, m01_ref):
    # Variant of _extract_kernel that reduces the raw patch to its two
    # intensity-centroid moments IN VMEM (m10 = sum raw*mask*u, m01 =
    # sum raw*mask*v — ops/orb.ic_angles semantics) and never writes the
    # raw patches to HBM: the raw side's only consumer is the orientation,
    # so this saves a 66 MB write + 66 MB read per image at bench shape.
    wp = win_ref.shape[2]
    cap = ry_ref.shape[2]            # slots per band (static block shape)
    win = win_ref.shape[1] // 2      # band + 32 (runtime band knob)
    band = win - 32
    w = win_ref[0]                                       # (2*WIN, WP)
    x0v = x0v_ref[0, 0]                                  # (CAP*_PP,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (wp, cap * _PP), 0)
    col = (rows == x0v[None, :]).astype(jnp.float32)     # (WP, CAP*_PP)
    # HIGHEST: Mosaic's default f32 dot is single-pass bf16 (hardware
    # bit-agreement 0.98327 on 08-18 — preferred_element_type only sets
    # the accumulator); HIGHEST makes the one-hot selection exact, as it
    # provably does for the T_BRIEF sampling dot (1.00000 same run)
    t = jnp.dot(w, col, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (2W, CAP*_PP)
    mu = mu_ref[:]                                       # (_PP, _PP)
    mv = mv_ref[:]
    blurs, m10s, m01s = [], [], []
    for c in range(cap):
        # 8-way masked accumulate over static slices (see _extract_kernel)
        ry = ry_ref[0, 0, c]
        raw = jnp.zeros((_PP, _PP), jnp.float32)
        blur = jnp.zeros((_PP, _PP), jnp.float32)
        for r in range(band):
            sel = (ry == r).astype(jnp.float32)
            raw = raw + sel * jax.lax.slice(
                t, (r, c * _PP), (r + _PP, (c + 1) * _PP))
            blur = blur + sel * jax.lax.slice(
                t, (win + r, c * _PP), (win + r + _PP, (c + 1) * _PP))
        blurs.append(blur)
        m10s.append(jnp.sum(raw * mu))
        m01s.append(jnp.sum(raw * mv))
    blur_ref[0] = jnp.concatenate(blurs, axis=1)
    # moment outputs are (1, 1, CAP) blocks over (NB, 1, CAP) arrays —
    # a (1, CAP) block over (NB, CAP) violates the same trailing-dims rule
    m10_ref[0, 0] = jnp.stack(m10s)
    m01_ref[0, 0] = jnp.stack(m01s)


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_windows_moments(win_raw, win_blur, tbl_x0, rel_y,
                            interpret: bool = False):
    """Like `extract_windows`, but returns (blur, m10, m01): blurred
    patches plus the raw patches' IC-orientation moments, computed
    in-kernel (the raw patches never reach HBM). m10/m01: (NB, CAP) f32;
    angle = arctan2(m01, m10). Moment sums reorder f32 adds vs
    ops/orb.ic_angles (32x32 zero-padded reduction vs 31x31) — equal to
    ~1e-4 relative, pose-level-exact."""
    from .orb import _ic_angle_masks

    nb, _, wp = win_raw.shape
    cap = tbl_x0.shape[1]            # slots per band (static)
    j = jnp.arange(_PP, dtype=jnp.int32)
    x0v = tbl_x0[:, :, None] + j[None, None, :]
    x0v = jnp.where(j[None, None, :] < 31, x0v, -1_000_000)
    x0v = x0v.reshape(nb, 1, cap * _PP)
    wcat = jnp.concatenate([win_raw, win_blur], axis=1)      # (NB, 2W, WP)

    mask_np, us_np, vs_np = _ic_angle_masks()
    mu = jnp.asarray(np.pad(mask_np * us_np, ((0, 1), (0, 1))))
    mv = jnp.asarray(np.pad(mask_np * vs_np, ((0, 1), (0, 1))))

    blur, m10, m01 = pl.pallas_call(
        _extract_moments_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb, _PP, cap * _PP), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, cap), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, cap), jnp.float32),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, wcat.shape[1], wp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap * _PP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PP, _PP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PP, _PP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _PP, cap * _PP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(wcat, x0v, mu, mv, rel_y.astype(jnp.int32).reshape(nb, 1, cap))
    blur = blur.reshape(nb, _PP, cap, _PP).transpose(0, 2, 1, 3)
    return blur, m10.reshape(nb, cap), m01.reshape(nb, cap)


def _t_extract_slots(planes, x0_ref, ry_ref, mu_ref, mv_ref, wt_ref,
                     nbody: int = 1, band: int = 8):
    """Shared transposed-extraction body of _extract_t_kernel and
    _extract_t_brief_kernel (kept in ONE place: this is the trickiest
    VMEM-layout code in the repo — pad-to-128 before the transpose, edge
    zero rows, per-slot dynamic sublane slice + 8-way masked accumulate —
    and the two kernels must stay provably identical on it).

    v2 layout: NO one-hot matmul at all. The band window is rebuilt from
    overlapping (BAND, WP) atlas blocks per plane (the XLA-side
    windows() materialization disappears), transposed ONCE in VMEM, and
    each keypoint slot is served by a dynamic *sublane* slice at its
    column start plus an 8-way masked accumulate over its in-band row
    offset. This removes the 57 GFLOP/image selection-matmul floor of
    _extract_kernel (docs/PERF_LOG.md roofline, "banded extraction" row);
    what remains is pure VPU data movement on 32x32 tiles.

    v2.1 `nbody`: bands served per grid step. The (128, WP) transpose is
    the kernel's dominant fixed cost (docs/PERF_LOG.md round 4: ~1.66 ms
    of the 2.5 ms/image extraction block at nbody=1); one transpose can
    serve up to FOUR bands because 2 planes x (8*nbody + 32) window rows
    = 16*nbody + 64 <= 128 exactly at nbody=4 — cutting both the
    transpose count (4x) and the overlapping-block read amplification
    (5 blocks/band -> 2 blocks/band). Values selected are bit-identical
    for any nbody; the slot loop just unrolls nbody*CAP bodies (Mosaic
    program-size hazard caps nbody — see CLAUDE.md hazard #5).

    Patches are produced TRANSPOSED ([u, v] = [x, y]) — consumers use
    ops/orb.steered_brief_t / transposed moment masks, selecting the
    exact same values (bit-identical descriptors).

    planes: the 2*(nbody+4) (BAND, WP) refs (raw blocks then blur
    blocks). Returns (blurs, m10s, m01s): nbody*CAP-length lists (band-
    major) of (_PP, _PP) transposed blurred patches and raw-patch IC
    moment scalars.
    """
    cap = x0_ref.shape[2] // nbody   # slots per band (static block shape)
    nrows = 2 * (band * nbody + 32)         # raw + blur plane rows
    w = jnp.concatenate([p[:] for p in planes], axis=0)
    # pad rows to 128 before transposing: Mosaic lowers f32 transposes
    # most reliably when the resulting LANE dim is a 128-multiple (the
    # padding lives in VMEM only and the per-slot slices below never read
    # lanes >= nrows)
    if nrows < 128:
        w = jnp.concatenate(
            [w, jnp.zeros((128 - nrows, w.shape[1]), w.dtype)], axis=0)
    wt = jnp.transpose(w)                                    # (WP, 128)
    # 8 zero rows so the x0 = WP - 31 edge slice stays in bounds; staged
    # through VMEM scratch because Mosaic only supports dynamic (pl.ds)
    # slicing on refs, not on values
    wt_ref[:] = jnp.concatenate(
        [wt, jnp.zeros((band, wt.shape[1]), wt.dtype)], axis=0)
    mu = mu_ref[:]                                           # (_PP, _PP) m.T
    mv = mv_ref[:]
    blur_base = band * nbody + 32           # first blur-plane lane
    blurs, m10s, m01s = [], [], []
    for j in range(nbody):
        for c in range(cap):
            idx = j * cap + c
            x0c = x0_ref[0, 0, idx]
            ryc = ry_ref[0, 0, idx]
            xs = wt_ref[pl.ds(x0c, _PP), :]                  # (_PP, 128)
            raw_t = jnp.zeros((_PP, _PP), jnp.float32)
            blur_t = jnp.zeros((_PP, _PP), jnp.float32)
            # exactly one r matches; masked multiply-accumulate (scalar-
            # pred selects lower less uniformly than fma across Mosaic
            # versions)
            for r in range(band):
                sel = (ryc == r).astype(jnp.float32)
                raw_t = raw_t + sel * jax.lax.slice(
                    xs, (0, band * j + r), (_PP, band * j + r + _PP))
                blur_t = blur_t + sel * jax.lax.slice(
                    xs, (0, blur_base + band * j + r),
                    (_PP, blur_base + band * j + r + _PP))
            blurs.append(blur_t)
            m10s.append(jnp.sum(raw_t * mu))
            m01s.append(jnp.sum(raw_t * mv))
    return blurs, m10s, m01s


def _extract_t_kernel(nbody, band, *refs):
    # v2 kernel: transposed extraction + in-kernel IC moments (see
    # _t_extract_slots for the layout details). refs: 2*(nbody+4) plane
    # blocks, 4 tables, 3 outputs, 1 scratch.
    np_ = 2 * (nbody + 32 // band)
    planes = refs[:np_]
    x0_ref, ry_ref, mu_ref, mv_ref = refs[np_:np_ + 4]
    blur_ref, m10_ref, m01_ref, wt_ref = refs[np_ + 4:]
    blurs, m10s, m01s = _t_extract_slots(
        planes, x0_ref, ry_ref, mu_ref, mv_ref, wt_ref, nbody=nbody,
        band=band)
    blur_ref[0] = jnp.concatenate(blurs, axis=1)
    m10_ref[0, 0] = jnp.stack(m10s)
    m01_ref[0, 0] = jnp.stack(m01s)


def _pad_tables(tbl_x0, rel_y, nb, nbody):
    """Pad the (NB, CAP) slot tables to g*nbody bands (parked rows: x0=0,
    rel_y=-1 — matches no unrolled r, accumulates nothing) and regroup to
    (g, 1, nbody*CAP) SMEM blocks."""
    g = -(-nb // nbody)
    pad = g * nbody - nb
    cap = tbl_x0.shape[1]
    x0 = jnp.pad(tbl_x0.astype(jnp.int32), ((0, pad), (0, 0)))
    ry = jnp.pad(rel_y.astype(jnp.int32), ((0, pad), (0, 0)),
                 constant_values=-1)
    return (g, x0.reshape(g, 1, nbody * cap), ry.reshape(g, 1, nbody * cap))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "nbody", "band"))
def extract_windows_t(atlas, blurred, tbl_x0, rel_y, interpret: bool = False,
                      nbody: int = 1, band: int | None = None):
    """Transposed zero-FLOP extraction: (blur_t, m10, m01) from the atlases.

    atlas/blurred: (HA, WP) with HA % BAND == 0 and >= 40 dead pad rows at
    the bottom (atlas_layout guarantees 48+; bands whose 5-block window
    would overrun the atlas are clamped to the last block and can only
    contain parked/invalid keypoints). tbl_x0/rel_y: (NB, CAP) int32 as in
    banded_extract.

    Returns blur_t (NB, CAP, _PP, _PP) f32 with patches TRANSPOSED
    (blur_t[b, c, u, v] == blurred[y0 + v, x0 + u] for u, v < 31), plus the
    raw patches' IC moments m10/m01 (NB, CAP) computed in-kernel (raw
    patches never reach HBM). Feed blur_t to ops/orb.steered_brief_t for
    bit-identical descriptors. `nbody`: bands per grid step (1, 2 or 4 —
    see _t_extract_slots v2.1)."""
    from .orb import _ic_angle_masks

    band = BAND if band is None else int(band)
    assert band * nbody <= 32, (band, nbody)
    ha, wp = atlas.shape
    nb = ha // band
    cap = tbl_x0.shape[1]            # slots per band (static)
    nq = nbody + 32 // band                      # blocks per plane

    mask_np, us_np, vs_np = _ic_angle_masks()
    mu_t = jnp.asarray(np.pad(mask_np * us_np, ((0, 1), (0, 1))).T)
    mv_t = jnp.asarray(np.pad(mask_np * vs_np, ((0, 1), (0, 1))).T)
    g, x0_g, ry_g = _pad_tables(tbl_x0, rel_y, nb, nbody)

    def _block(q):
        return pl.BlockSpec(
            (band, wp),
            lambda b, q=q: (jnp.minimum(b * nbody + q, nb - 1), 0),
            memory_space=pltpu.VMEM)

    blur, m10, m01 = pl.pallas_call(
        functools.partial(_extract_t_kernel, nbody, band),
        out_shape=(
            jax.ShapeDtypeStruct((g, _PP, nbody * cap * _PP), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, nbody * cap), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, nbody * cap), jnp.float32),
        ),
        grid=(g,),
        in_specs=(
            [_block(q) for q in range(nq)]          # raw plane blocks
            + [_block(q) for q in range(nq)]        # blur plane blocks
            + [
                # scalar tables travel (G, 1, nbody*CAP): Mosaic's
                # trailing-dims block rule applies to SMEM non-trivial
                # windows too
                pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((_PP, _PP), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_PP, _PP), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        ),
        out_specs=(
            pl.BlockSpec((1, _PP, nbody * cap * _PP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((wp + band, 128), jnp.float32)],
        interpret=interpret,
    )(*([atlas] * nq + [blurred] * nq + [x0_g, ry_g, mu_t, mv_t]))
    blur = blur.reshape(g, _PP, nbody, cap, _PP).transpose(0, 2, 3, 1, 4)
    blur = blur.reshape(g * nbody, cap, _PP, _PP)[:nb]
    return (blur, m10.reshape(g * nbody, cap)[:nb],
            m01.reshape(g * nbody, cap)[:nb])


def _extract_t_brief_kernel(quant, nbody, band, *refs):
    # v3 kernel: _extract_t_kernel + steered BRIEF in-kernel. The blurred
    # patches never reach HBM: per slot, the IC rotation (cos/sin) is
    # derived from the in-kernel moments by normalization (no atan2 —
    # Mosaic doesn't lower it), the 256-pair pattern is rotated on
    # 256-lane vectors, and each of the two sample points is fetched with
    # a one-hot matmul against the VMEM-resident transposed patch (exactly
    # the contraction ops/orb.steered_brief_t runs in XLA, so the bits are
    # the same wherever the normalized cos/sin agree with XLA's
    # arctan2->cos/sin chain — bit-identical in interpret mode up to ULP;
    # a differing sample needs round() to sit on a .5 boundary).
    # patx/paty: (2, 256) f32 — pattern point j's x/y per pair lane.
    # refs: 2*(nbody+4) plane blocks, 6 tables, 3 outputs, 1 scratch
    # (nbody: bands per grid step, see _t_extract_slots v2.1).
    np_ = 2 * (nbody + 32 // band)
    planes = refs[:np_]
    x0_ref, ry_ref, mu_ref, mv_ref, patx_ref, paty_ref = refs[np_:np_ + 6]
    bits_ref, m10_ref, m01_ref, wt_ref = refs[np_ + 6:]
    cap = x0_ref.shape[2] // nbody   # slots per band (static block shape)
    blurs, m10s, m01s = _t_extract_slots(
        planes, x0_ref, ry_ref, mu_ref, mv_ref, wt_ref, nbody=nbody,
        band=band)
    m10v = jnp.stack(m10s)[None, :]                          # (1, nbody*CAP)
    m01v = jnp.stack(m01s)[None, :]
    # cos/sin of atan2(m01, m10) by direct normalization — Mosaic has no
    # atan2 lowering, and cos(atan2(y, x)) == x/hypot exactly in real
    # arithmetic (ULP-level differences vs XLA's arctan2->cos/sin chain
    # can flip a BRIEF sample only on a round() .5 boundary, which the
    # validation bit-agreement gate covers). atan2(0, 0) = 0 -> (1, 0).
    r = jnp.sqrt(m10v * m10v + m01v * m01v)
    rsafe = jnp.where(r > 0.0, r, 1.0)
    cav = jnp.where(r > 0.0, m10v / rsafe, 1.0)
    sav = jnp.where(r > 0.0, m01v / rsafe, 0.0)

    rows32 = jax.lax.broadcasted_iota(jnp.int32, (_PP, 256), 0)
    bits = []
    for c in range(nbody * cap):
        ca = cav[0, c]
        sa = sav[0, c]
        vals = []
        for j in range(2):
            px = patx_ref[j: j + 1, :]                       # (1, 256)
            py = paty_ref[j: j + 1, :]
            rx = px * ca - py * sa
            ry_ = px * sa + py * ca
            ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + PATCH_R,
                          0, 2 * PATCH_R)
            iy = jnp.clip(jnp.round(ry_).astype(jnp.int32) + PATCH_R,
                          0, 2 * PATCH_R)
            uoh = (rows32 == ix).astype(jnp.float32)         # (_PP, 256)
            voh = (rows32 == iy).astype(jnp.float32)
            q = jnp.dot(blurs[c], voh,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (_PP, 256)
            v = jnp.sum(uoh * q, axis=0, keepdims=True)
            # mirror orb._brief_bits's cv2-interop quantization (static)
            vals.append(jnp.round(v) if quant else v)
        bits.append((vals[0] < vals[1]).astype(jnp.float32))
    bits_ref[0] = jnp.concatenate(bits, axis=0).astype(bits_ref.dtype)
    m10_ref[0, 0] = jnp.stack(m10s)
    m01_ref[0, 0] = jnp.stack(m01s)


def _extract_t_brief_kernel_v4(quant, nbody, band, *refs):
    # v4 "slot diet" kernel (round 4): same outputs as
    # _extract_t_brief_kernel, bit-identical by construction, ~0.5x the
    # per-slot VPU work. Two changes inside the slot loop:
    #   1. The blurred patch is never extracted. The BRIEF sample
    #      blur[iy[p]] is selected DIRECTLY from the 40-lane band window
    #      by folding the slot's in-band row offset into the one-hot:
    #      q = xs_win(32, 40) @ (rows40 == iy + ryc) — selecting
    #      xs[u, blur_base + 8j + ryc + iy[p]], exactly the value the v3
    #      chain blur_t[u, iy[p]] selects (one nonzero per column, so the
    #      dot is exact). Kills 8 of the 16 masked slice-FMAs per slot.
    #   2. Both BRIEF sample points ride ONE (32, 40) @ (40, 512) MXU dot
    #      (columns = 2 x 256 pair lanes) instead of two K=32 dots.
    # The raw patch extraction + IC moments stay the v3 masked-accumulate
    # code (bit-exact continuity of the angle chain).
    np_ = 2 * (nbody + 32 // band)
    planes = refs[:np_]
    x0_ref, ry_ref, mu_ref, mv_ref, patx_ref, paty_ref = refs[np_:np_ + 6]
    bits_ref, m10_ref, m01_ref, wt_ref = refs[np_ + 6:]
    cap = x0_ref.shape[2] // nbody   # slots per band (static block shape)
    win = band + 32

    nrows = 2 * (band * nbody + 32)
    w = jnp.concatenate([p[:] for p in planes], axis=0)
    if nrows < 128:
        w = jnp.concatenate(
            [w, jnp.zeros((128 - nrows, w.shape[1]), w.dtype)], axis=0)
    wtp = jnp.transpose(w)
    wt_ref[:] = jnp.concatenate(
        [wtp, jnp.zeros((band, wtp.shape[1]), wtp.dtype)], axis=0)
    mu = mu_ref[:]
    mv = mv_ref[:]
    blur_base = band * nbody + 32

    rows40 = jax.lax.broadcasted_iota(jnp.int32, (win, 512), 0)
    rows32 = jax.lax.broadcasted_iota(jnp.int32, (_PP, 512), 0)
    px2 = jnp.concatenate([patx_ref[0:1, :], patx_ref[1:2, :]], axis=1)
    py2 = jnp.concatenate([paty_ref[0:1, :], paty_ref[1:2, :]], axis=1)

    bits, m10s, m01s = [], [], []
    for j in range(nbody):
        for c in range(cap):
            idx = j * cap + c
            x0c = x0_ref[0, 0, idx]
            ryc = ry_ref[0, 0, idx]
            xs = wt_ref[pl.ds(x0c, _PP), :]                  # (_PP, 128)
            raw_t = jnp.zeros((_PP, _PP), jnp.float32)
            for r in range(band):
                sel = (ryc == r).astype(jnp.float32)
                raw_t = raw_t + sel * jax.lax.slice(
                    xs, (0, band * j + r), (_PP, band * j + r + _PP))
            m10 = jnp.sum(raw_t * mu)
            m01 = jnp.sum(raw_t * mv)
            m10s.append(m10)
            m01s.append(m01)
            # cos/sin by normalization — identical chain to v3
            r_ = jnp.sqrt(m10 * m10 + m01 * m01)
            rsafe = jnp.where(r_ > 0.0, r_, 1.0)
            ca = jnp.where(r_ > 0.0, m10 / rsafe, 1.0)
            sa = jnp.where(r_ > 0.0, m01 / rsafe, 0.0)
            rx = px2 * ca - py2 * sa                         # (1, 512)
            ry2 = px2 * sa + py2 * ca
            ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + PATCH_R,
                          0, 2 * PATCH_R)
            iy = jnp.clip(jnp.round(ry2).astype(jnp.int32) + PATCH_R,
                          0, 2 * PATCH_R)
            voh = (rows40 == iy + ryc).astype(jnp.float32)   # (win, 512)
            uoh = (rows32 == ix).astype(jnp.float32)         # (_PP, 512)
            xw = jax.lax.slice(xs, (0, blur_base + band * j),
                               (_PP, blur_base + band * j + win))
            q = jnp.dot(xw, voh, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (_PP, 512)
            vals = jnp.sum(uoh * q, axis=0, keepdims=True)   # (1, 512)
            if quant:
                vals = jnp.round(vals)
            v0 = jax.lax.slice(vals, (0, 0), (1, 256))
            v1 = jax.lax.slice(vals, (0, 256), (1, 512))
            bits.append((v0 < v1).astype(jnp.float32))
    bits_ref[0] = jnp.concatenate(bits, axis=0).astype(bits_ref.dtype)
    m10_ref[0, 0] = jnp.stack(m10s)
    m01_ref[0, 0] = jnp.stack(m01s)


def _brief_bits_from_patch(blur_t, ca, sa, patx_ref, paty_ref, rows32,
                           quant):
    """One slot's 256 steered-BRIEF bits from its transposed blurred patch
    (the v3 kernel's sampling chain verbatim, factored out so the quad
    kernel reuses it bit-for-bit). ca/sa: scalar cos/sin of the IC angle;
    returns (1, 256) f32 0/1."""
    vals = []
    for j in range(2):
        px = patx_ref[j: j + 1, :]                       # (1, 256)
        py = paty_ref[j: j + 1, :]
        rx = px * ca - py * sa
        ry_ = px * sa + py * ca
        ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + PATCH_R,
                      0, 2 * PATCH_R)
        iy = jnp.clip(jnp.round(ry_).astype(jnp.int32) + PATCH_R,
                      0, 2 * PATCH_R)
        uoh = (rows32 == ix).astype(jnp.float32)         # (_PP, 256)
        voh = (rows32 == iy).astype(jnp.float32)
        q = jnp.dot(blur_t, voh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (_PP, 256)
        v = jnp.sum(uoh * q, axis=0, keepdims=True)
        vals.append(jnp.round(v) if quant else v)
    return (vals[0] < vals[1]).astype(jnp.float32)


def _extract_t_brief_kernel_quad(quant, nbody, band, *refs):
    # v6 "quad" kernel (round 5): slots processed FOUR at a time with the
    # row/plane selection done by ONE block-structured one-hot MXU matmul
    # per quad instead of 16 masked 32-lane slice-FMAs per slot. The v3
    # slot loop is VPU-issue bound (docs/PERF_LOG.md round 4: ~260 ns/slot
    # with diet v4 and predication v5 both rejected); its per-slot ops run
    # 32-lane tiles at 25% lane utilization. Here:
    #   1. four slots' column windows are concatenated into XS4 (128, 128)
    #      — four dynamic sublane slices, full 128-lane rows;
    #   2. one (128,128)@(128,256) dot against a block one-hot RB selects
    #      each slot's raw rows (cols 0:128) and blur rows (cols 128:256)
    #      at its own in-plane offset off_q = 8j + ry_q. HIGHEST makes the
    #      selection exact (one nonzero per column), so the diagonal
    #      blocks equal the v3 masked-accumulate results BIT-FOR-BIT;
    #      off-diagonal blocks (slot q's rows at slot q''s columns) are
    #      discarded by the static diagonal slicing.
    #   3. moments + steered BRIEF run the v3 per-slot chain verbatim on
    #      the diagonal blocks (same shapes, same reduction orders).
    # Parked slots carry rel_y <= -1, so off_q + v stays negative and
    # their one-hot columns are all-zero -> zero patches, zero moments,
    # zero bits — exactly the v3 contract. Requires cap % 4 == 0 (already
    # the banded_extract contract), so a quad never spans bands.
    np_ = 2 * (nbody + 32 // band)
    planes = refs[:np_]
    x0_ref, ry_ref, mu_ref, mv_ref, patx_ref, paty_ref = refs[np_:np_ + 6]
    bits_ref, m10_ref, m01_ref, wt_ref = refs[np_ + 6:]
    cap = x0_ref.shape[2] // nbody   # slots per band (static block shape)

    nrows = 2 * (band * nbody + 32)
    w = jnp.concatenate([p[:] for p in planes], axis=0)
    if nrows < 128:
        w = jnp.concatenate(
            [w, jnp.zeros((128 - nrows, w.shape[1]), w.dtype)], axis=0)
    wtp = jnp.transpose(w)
    wt_ref[:] = jnp.concatenate(
        [wtp, jnp.zeros((band, wtp.shape[1]), wtp.dtype)], axis=0)
    mu = mu_ref[:]
    mv = mv_ref[:]
    blur_base = band * nbody + 32
    rows32 = jax.lax.broadcasted_iota(jnp.int32, (_PP, 256), 0)

    # static pieces of the RB one-hot's column-offset vector:
    # target[l? given column n]: n in [0,128) raw block, [128,256) blur.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    qsel = (lane // 32) % 4                      # quad-member of column n
    vbase = (lane % 32) + jnp.where(lane >= 128, blur_base, 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)

    bits, m10s, m01s = [], [], []
    for j in range(nbody):
        for g in range(cap // 4):
            idx0 = j * cap + 4 * g
            xs4 = jnp.concatenate(
                [wt_ref[pl.ds(x0_ref[0, 0, idx0 + q], _PP), :]
                 for q in range(4)], axis=0)                 # (128, 128)
            # offv[n] = off_q(n) + v(n) (+ blur_base on the blur half);
            # parked slots (ry < 0) take a -1000 sentinel so offv stays
            # negative on BOTH halves for any j/v -> all-zero columns
            # (ry=-31 alone is not enough: 8j + ry + blur_base + v can
            # reach a live lane at j >= 1)
            offv = vbase
            for q in range(4):
                ryq = ry_ref[0, 0, idx0 + q]
                offq = jnp.where(ryq >= 0, band * j + ryq, -1000)
                offv = offv + jnp.where(qsel == q, offq, 0)
            rb = (sub == offv).astype(jnp.float32)           # (128, 256)
            out = jnp.dot(xs4, rb, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            for q in range(4):
                raw_t = jax.lax.slice(
                    out, (32 * q, 32 * q), (32 * q + _PP, 32 * q + _PP))
                blur_t = jax.lax.slice(
                    out, (32 * q, 128 + 32 * q),
                    (32 * q + _PP, 128 + 32 * q + _PP))
                m10 = jnp.sum(raw_t * mu)
                m01 = jnp.sum(raw_t * mv)
                m10s.append(m10)
                m01s.append(m01)
                # cos/sin by normalization — identical chain to v3
                r_ = jnp.sqrt(m10 * m10 + m01 * m01)
                rsafe = jnp.where(r_ > 0.0, r_, 1.0)
                ca = jnp.where(r_ > 0.0, m10 / rsafe, 1.0)
                sa = jnp.where(r_ > 0.0, m01 / rsafe, 0.0)
                bits.append(_brief_bits_from_patch(
                    blur_t, ca, sa, patx_ref, paty_ref, rows32, quant))
    bits_ref[0] = jnp.concatenate(bits, axis=0).astype(bits_ref.dtype)
    m10_ref[0, 0] = jnp.stack(m10s)
    m01_ref[0, 0] = jnp.stack(m01s)


def _extract_t_brief_kernel_v8(quant, nbody, band, *refs):
    # v8 (round 5): quad's MXU row-select + the BRIEF *sampling* batched
    # 4 slots per MXU contraction with the one-hots still built PER SLOT
    # at the continuous angle — BIT-IDENTICAL to v3/v6 (same uoh/voh
    # values, same exact one-hot selections at HIGHEST), unlike v7's
    # binned tables. Removes per slot: 2 small (32,32)@(32,256) dots + 2
    # masked axis-0 reductions; adds per quad: 2 (128,512) concats + one
    # (128,128)@(128,512) sampling dot + one (4,128)@(128,512) selection
    # dot. No data-dependent slices anywhere (v7's measured killer).
    np_ = 2 * (nbody + 32 // band)
    planes = refs[:np_]
    x0_ref, ry_ref, mu_ref, mv_ref, patx_ref, paty_ref = refs[np_:np_ + 6]
    bits_ref, m10_ref, m01_ref, wt_ref = refs[np_ + 6:]
    cap = x0_ref.shape[2] // nbody   # slots per band (static block shape)

    nrows = 2 * (band * nbody + 32)
    w = jnp.concatenate([p[:] for p in planes], axis=0)
    if nrows < 128:
        w = jnp.concatenate(
            [w, jnp.zeros((128 - nrows, w.shape[1]), w.dtype)], axis=0)
    wtp = jnp.transpose(w)
    wt_ref[:] = jnp.concatenate(
        [wtp, jnp.zeros((band, wtp.shape[1]), wtp.dtype)], axis=0)
    mu = mu_ref[:]
    mv = mv_ref[:]
    blur_base = band * nbody + 32

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    qsel = (lane // 32) % 4                      # quad-member of column n
    vbase = (lane % 32) + jnp.where(lane >= 128, blur_base, 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    bdmask = ((r128 // 32) == (c128 // 32)).astype(jnp.float32)
    g4r = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
    g4c = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    sel4 = (g4r == (g4c // 32)).astype(jnp.float32)          # (4, 128)
    # pattern x/y as one (1, 512) j-major row (v3's j loop flattened)
    px512 = jnp.concatenate([patx_ref[0:1, :], patx_ref[1:2, :]], axis=1)
    py512 = jnp.concatenate([paty_ref[0:1, :], paty_ref[1:2, :]], axis=1)
    rows512 = jax.lax.broadcasted_iota(jnp.int32, (_PP, 512), 0)

    bits, m10s, m01s = [], [], []
    for j in range(nbody):
        for g in range(cap // 4):
            idx0 = j * cap + 4 * g
            xs4 = jnp.concatenate(
                [wt_ref[pl.ds(x0_ref[0, 0, idx0 + q], _PP), :]
                 for q in range(4)], axis=0)                 # (128, 128)
            offv = vbase
            for q in range(4):
                ryq = ry_ref[0, 0, idx0 + q]
                offq = jnp.where(ryq >= 0, band * j + ryq, -1000)
                offv = offv + jnp.where(qsel == q, offq, 0)
            rb = (sub == offv).astype(jnp.float32)           # (128, 256)
            out = jnp.dot(xs4, rb, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            blurd = jax.lax.slice(out, (0, 128), (128, 256)) * bdmask
            uohs, vohs = [], []
            for q in range(4):
                raw_t = jax.lax.slice(
                    out, (32 * q, 32 * q), (32 * q + _PP, 32 * q + _PP))
                m10 = jnp.sum(raw_t * mu)
                m01 = jnp.sum(raw_t * mv)
                m10s.append(m10)
                m01s.append(m01)
                r_ = jnp.sqrt(m10 * m10 + m01 * m01)
                rsafe = jnp.where(r_ > 0.0, r_, 1.0)
                ca = jnp.where(r_ > 0.0, m10 / rsafe, 1.0)
                sa = jnp.where(r_ > 0.0, m01 / rsafe, 0.0)
                rx = px512 * ca - py512 * sa                 # (1, 512)
                ry_ = px512 * sa + py512 * ca
                ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + PATCH_R,
                              0, 2 * PATCH_R)
                iy = jnp.clip(jnp.round(ry_).astype(jnp.int32) + PATCH_R,
                              0, 2 * PATCH_R)
                uohs.append((rows512 == ix).astype(jnp.float32))
                vohs.append((rows512 == iy).astype(jnp.float32))
            UOH4 = jnp.concatenate(uohs, axis=0)             # (128, 512)
            VOH4 = jnp.concatenate(vohs, axis=0)
            qmat = jnp.dot(blurd, VOH4,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            prd = UOH4 * qmat                                # (128, 512)
            vals = jnp.dot(sel4, prd,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (4, 512)
            if quant:
                vals = jnp.round(vals)
            v0 = jax.lax.slice(vals, (0, 0), (4, 256))
            v1 = jax.lax.slice(vals, (0, 256), (4, 512))
            bits.append((v0 < v1).astype(jnp.float32))
    bits_ref[0] = jnp.concatenate(bits, axis=0).astype(bits_ref.dtype)
    m10_ref[0, 0] = jnp.stack(m10s)
    m01_ref[0, 0] = jnp.stack(m01s)


def _extract_t_brief_kernel_v7(quant, nbody, band, *refs):
    # v7 "binned" kernel (round 5): quad's MXU row-select PLUS the BRIEF
    # sampling batched 4 slots per MXU contraction through STATIC
    # steering tables (orb.brief_bin_tables — the ORB paper §4.3 30-bin
    # discretization; cv2's continuous rotation is what v3/v6 mirror).
    # The v6 measurement left ~2/3 of the per-slot cost in the per-slot
    # BRIEF chain (per slot: 4 one-hot CONSTRUCTIONS (32,256), 2 dots,
    # 2 masked sums, ~20 scalar rotation ops). With the angle quantized
    # to 30 bins the one-hots become static lookup tables, so per quad:
    #   1. rowsel dot (128,128)@(128,256) — v6's, unchanged;
    #   2. per slot only: 2 moment reduces, ~6 bin-argmax ops, 2 table
    #      row-slices (32, 512) — no rotation math, no one-hot builds;
    #   3. ONE (128,128)@(128,512) dot samples all 4 slots' 512 points
    #      (block-diag blur operand x bin-selected one-hot stack), one
    #      (4,128)@(128,512) selection dot reduces to per-slot values.
    # Sampling values are exact one-hot selections at HIGHEST, so bits
    # are bit-identical to steered_brief_t_binned on the same moments.
    # Parked slots: zero windows -> zero moments -> bin 0 -> zero
    # samples -> zero bits (the v3 contract).
    np_ = 2 * (nbody + 32 // band)
    planes = refs[:np_]
    (x0_ref, ry_ref, mu_ref, mv_ref, patx_ref, paty_ref,
     uoh_ref, voh_ref, bin_ref) = refs[np_:np_ + 9]
    bits_ref, m10_ref, m01_ref, wt_ref = refs[np_ + 9:]
    cap = x0_ref.shape[2] // nbody   # slots per band (static block shape)

    nrows = 2 * (band * nbody + 32)
    w = jnp.concatenate([p[:] for p in planes], axis=0)
    if nrows < 128:
        w = jnp.concatenate(
            [w, jnp.zeros((128 - nrows, w.shape[1]), w.dtype)], axis=0)
    wtp = jnp.transpose(w)
    wt_ref[:] = jnp.concatenate(
        [wtp, jnp.zeros((band, wtp.shape[1]), wtp.dtype)], axis=0)
    mu = mu_ref[:]
    mv = mv_ref[:]
    blur_base = band * nbody + 32

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    qsel = (lane // 32) % 4                      # quad-member of column n
    vbase = (lane % 32) + jnp.where(lane >= 128, blur_base, 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    # static in-kernel selection masks (built once per grid step)
    r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    bdmask = ((r128 // 32) == (c128 // 32)).astype(jnp.float32)
    g4r = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
    g4c = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    sel4 = (g4r == (g4c // 32)).astype(jnp.float32)          # (4, 128)
    cosv = bin_ref[0:1, :]                       # (1, 128), 0 past 30 bins
    sinv = bin_ref[1:2, :]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    bits, m10s, m01s = [], [], []
    for j in range(nbody):
        for g in range(cap // 4):
            idx0 = j * cap + 4 * g
            xs4 = jnp.concatenate(
                [wt_ref[pl.ds(x0_ref[0, 0, idx0 + q], _PP), :]
                 for q in range(4)], axis=0)                 # (128, 128)
            offv = vbase
            for q in range(4):
                ryq = ry_ref[0, 0, idx0 + q]
                offq = jnp.where(ryq >= 0, band * j + ryq, -1000)
                offv = offv + jnp.where(qsel == q, offq, 0)
            rb = (sub == offv).astype(jnp.float32)           # (128, 256)
            out = jnp.dot(xs4, rb, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            blurd = jax.lax.slice(out, (0, 128), (128, 256)) * bdmask
            uohs, vohs = [], []
            for q in range(4):
                raw_t = jax.lax.slice(
                    out, (32 * q, 32 * q), (32 * q + _PP, 32 * q + _PP))
                m10 = jnp.sum(raw_t * mu)
                m01 = jnp.sum(raw_t * mv)
                m10s.append(m10)
                m01s.append(m01)
                # nearest steering bin by direction dot-product argmax
                # (first-match tie-break) — the orb.angle_bins chain
                dq = m10 * cosv + m01 * sinv                 # (1, 128)
                mx = jnp.max(dq)
                binq = jnp.min(jnp.where(dq >= mx, iota_b, 127))
                uohs.append(uoh_ref[pl.ds(binq * 32, _PP), :])
                vohs.append(voh_ref[pl.ds(binq * 32, _PP), :])
            UOH4 = jnp.concatenate(uohs, axis=0)             # (128, 512)
            VOH4 = jnp.concatenate(vohs, axis=0)
            qmat = jnp.dot(blurd, VOH4,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            prd = UOH4 * qmat                                # (128, 512)
            vals = jnp.dot(sel4, prd,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (4, 512)
            if quant:
                vals = jnp.round(vals)
            v0 = jax.lax.slice(vals, (0, 0), (4, 256))
            v1 = jax.lax.slice(vals, (0, 256), (4, 512))
            bits.append((v0 < v1).astype(jnp.float32))
    bits_ref[0] = jnp.concatenate(bits, axis=0).astype(bits_ref.dtype)
    m10_ref[0, 0] = jnp.stack(m10s)
    m01_ref[0, 0] = jnp.stack(m01s)


def _extract_t_brief_kernel_sparse(quant, nbody, band, *refs):
    # v5 "occupancy-predicated" kernel (round 4): the v3 math verbatim,
    # but every slot body is wrapped in @pl.when(ryc >= 0) — parked slots
    # (rel_y == -31 from atlas.banded_extract, or -1 from _pad_tables'
    # group padding) skip ALL their VPU/MXU work instead of burning the
    # full 16-FMA + one-hot + dot budget to accumulate provable zeros.
    # At the bench shape only ~47% of the NB*CAP slots are live
    # (4096 keypoints over 363 bands x CAP 24, docs/PERF_LOG.md round 4),
    # so the serial per-slot bound — the measured extraction floor —
    # roughly halves. Outputs for skipped slots are zeros, exactly what
    # the v3 kernel computes for them (rel_y < 0 matches no unrolled r:
    # zero patches -> zero moments -> zero bits); live slots run the
    # identical op chain, so the family is bit-identical to v3.
    #   - bits rows are written per-slot under the predicate into a
    #     zero-initialized block (single-sublane stores: the pattern
    #     five_point_pallas.py's bracket kernel already lowers).
    #   - moments go through an SMEM scratch (scalar stores are legal
    #     under @pl.when; VMEM scalar stores are not), then one vector
    #     assembly after the loop — the same stack() the v3 kernel does.
    np_ = 2 * (nbody + 32 // band)
    planes = refs[:np_]
    x0_ref, ry_ref, mu_ref, mv_ref, patx_ref, paty_ref = refs[np_:np_ + 6]
    bits_ref, m10_ref, m01_ref, wt_ref, m_scr = refs[np_ + 6:]
    cap = x0_ref.shape[2] // nbody   # slots per band (static block shape)

    nrows = 2 * (band * nbody + 32)
    w = jnp.concatenate([p[:] for p in planes], axis=0)
    if nrows < 128:
        w = jnp.concatenate(
            [w, jnp.zeros((128 - nrows, w.shape[1]), w.dtype)], axis=0)
    wtp = jnp.transpose(w)
    wt_ref[:] = jnp.concatenate(
        [wtp, jnp.zeros((band, wtp.shape[1]), wtp.dtype)], axis=0)
    mu = mu_ref[:]
    mv = mv_ref[:]
    blur_base = band * nbody + 32
    rows32 = jax.lax.broadcasted_iota(jnp.int32, (_PP, 256), 0)

    bits_ref[0] = jnp.zeros((nbody * cap, 256), bits_ref.dtype)
    for j in range(nbody):
        for c in range(cap):
            idx = j * cap + c
            ryc = ry_ref[0, 0, idx]
            m_scr[0, idx] = 0.0
            m_scr[1, idx] = 0.0

            @pl.when(ryc >= 0)
            def _slot(j=j, idx=idx, ryc=ryc):
                x0c = x0_ref[0, 0, idx]
                xs = wt_ref[pl.ds(x0c, _PP), :]              # (_PP, 128)
                raw_t = jnp.zeros((_PP, _PP), jnp.float32)
                blur_t = jnp.zeros((_PP, _PP), jnp.float32)
                for r in range(band):
                    sel = (ryc == r).astype(jnp.float32)
                    raw_t = raw_t + sel * jax.lax.slice(
                        xs, (0, band * j + r), (_PP, band * j + r + _PP))
                    blur_t = blur_t + sel * jax.lax.slice(
                        xs, (0, blur_base + band * j + r),
                        (_PP, blur_base + band * j + r + _PP))
                m10 = jnp.sum(raw_t * mu)
                m01 = jnp.sum(raw_t * mv)
                m_scr[0, idx] = m10
                m_scr[1, idx] = m01
                # cos/sin by normalization — identical chain to v3
                r_ = jnp.sqrt(m10 * m10 + m01 * m01)
                rsafe = jnp.where(r_ > 0.0, r_, 1.0)
                ca = jnp.where(r_ > 0.0, m10 / rsafe, 1.0)
                sa = jnp.where(r_ > 0.0, m01 / rsafe, 0.0)
                vals = []
                for p in range(2):
                    px = patx_ref[p: p + 1, :]               # (1, 256)
                    py = paty_ref[p: p + 1, :]
                    rx = px * ca - py * sa
                    ry_ = px * sa + py * ca
                    ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + PATCH_R,
                                  0, 2 * PATCH_R)
                    iy = jnp.clip(jnp.round(ry_).astype(jnp.int32) + PATCH_R,
                                  0, 2 * PATCH_R)
                    uoh = (rows32 == ix).astype(jnp.float32)  # (_PP, 256)
                    voh = (rows32 == iy).astype(jnp.float32)
                    q = jnp.dot(blur_t, voh,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                    v = jnp.sum(uoh * q, axis=0, keepdims=True)
                    vals.append(jnp.round(v) if quant else v)
                bits_ref[0, idx: idx + 1, :] = (
                    vals[0] < vals[1]).astype(bits_ref.dtype)
    m10_ref[0, 0] = jnp.stack([m_scr[0, i] for i in range(nbody * cap)])
    m01_ref[0, 0] = jnp.stack([m_scr[1, i] for i in range(nbody * cap)])


@functools.partial(jax.jit,
                   static_argnames=("interpret", "quant", "nbody", "diet",
                                    "sparse", "quad", "band", "binned",
                                    "quadsamp"))
def extract_windows_t_brief(atlas, blurred, tbl_x0, rel_y,
                            interpret: bool = False,
                            quant: bool | None = None,
                            nbody: int = 1,
                            diet: bool = False,
                            sparse: bool = False,
                            quad: bool = False,
                            band: int | None = None,
                            binned: bool = False,
                            quadsamp: bool = False):
    """Transposed extraction with IC moments AND steered BRIEF in-kernel.

    Same inputs as `extract_windows_t`; returns (bits, m10, m01) with
    bits (NB, CAP, 256) uint8 — the descriptor patches never leave VMEM.
    The pattern is ops/orb.brief_pattern() (honors RPE_BRIEF), rotated per
    slot by the in-kernel IC angle; the sampling contraction is the exact
    one-hot selection of orb.steered_brief_t. Reference behavior:
    cv2 ORB computeOrbDescriptors (src/core/pose_estimator.py:84-108).
    `nbody`: bands per grid step (1, 2 or 4 — one VMEM transpose serves
    nbody bands; bit-identical for any value, see _t_extract_slots).
    `diet`: route through _extract_t_brief_kernel_v4 (bit-identical slot
    diet — RPE_EXTRACT_T_BRIEF_V4 at the atlas call site; hardware-
    rejected, ~7% slower than v3, docs/PERF_LOG.md round 4).
    `sparse`: route through _extract_t_brief_kernel_sparse (bit-identical
    occupancy predication — RPE_EXTRACT_T_SPARSE at the atlas call site;
    requires parked slots to carry rel_y < 0, which
    atlas.banded_extract guarantees).
    `quad`: route through _extract_t_brief_kernel_quad (bit-identical
    4-slot MXU row-select — RPE_EXTRACT_T_QUAD at the atlas call site;
    round-5 layout experiment targeting the VPU-issue slot-loop floor).
    `binned`: route through _extract_t_brief_kernel_v7 (quad's row-select
    + BRIEF batched through the ORB-paper 30-bin static steering tables,
    RPE_EXTRACT_T_V7 at the atlas call site). NOT bit-identical to the
    continuous-steering kernels: descriptors change wherever the 30-bin
    rotation rounds a sample differently (paper-canonical deviation,
    PARITY.md); the exact twin is orb.steered_brief_t_binned."""
    import os

    from .orb import _ic_angle_masks, brief_pattern

    if quant is None:
        # CAUTION: env-derived default is baked in at first trace (jit
        # caches by callable identity); pass quant explicitly to override
        # within a process.
        q = os.environ.get("RPE_BRIEF_QUANT")
        if q is None:
            q = "1" if os.environ.get("RPE_BRIEF") == "cv2" else ""
        quant = bool(q and q != "0")

    band = BAND if band is None else int(band)
    assert band * nbody <= 32, (band, nbody)
    ha, wp = atlas.shape
    nb = ha // band
    cap = tbl_x0.shape[1]            # slots per band (static)
    nq = nbody + 32 // band                      # blocks per plane

    mask_np, us_np, vs_np = _ic_angle_masks()
    mu_t = jnp.asarray(np.pad(mask_np * us_np, ((0, 1), (0, 1))).T)
    mv_t = jnp.asarray(np.pad(mask_np * vs_np, ((0, 1), (0, 1))).T)
    pat = np.asarray(brief_pattern(), dtype=np.float32)      # (256, 2, 2)
    patx = jnp.asarray(pat[:, :, 0].T.copy())                # (2, 256)
    paty = jnp.asarray(pat[:, :, 1].T.copy())
    g, x0_g, ry_g = _pad_tables(tbl_x0, rel_y, nb, nbody)

    def _block(q):
        return pl.BlockSpec(
            (band, wp),
            lambda b, q=q: (jnp.minimum(b * nbody + q, nb - 1), 0),
            memory_space=pltpu.VMEM)

    if quadsamp:
        assert cap % 4 == 0, f"v8 kernel needs cap % 4 == 0, got {cap}"
        kfn = _extract_t_brief_kernel_v8
    elif binned:
        assert cap % 4 == 0, f"v7 kernel needs cap % 4 == 0, got {cap}"
        kfn = _extract_t_brief_kernel_v7
    elif quad:
        assert cap % 4 == 0, f"quad kernel needs cap % 4 == 0, got {cap}"
        kfn = _extract_t_brief_kernel_quad
    elif sparse:
        kfn = _extract_t_brief_kernel_sparse
    elif diet:
        kfn = _extract_t_brief_kernel_v4
    else:
        kfn = _extract_t_brief_kernel
    extra_ops, extra_specs = [], []
    if binned:
        from .orb import brief_bin_tables, brief_bin_vectors

        _, _, uoh_np, voh_np = brief_bin_tables()
        cosb, sinb = brief_bin_vectors()
        binrow = np.zeros((2, 128), np.float32)
        binrow[0, : cosb.shape[0]] = cosb
        binrow[1, : sinb.shape[0]] = sinb
        extra_ops = [jnp.asarray(uoh_np), jnp.asarray(voh_np),
                     jnp.asarray(binrow)]
        extra_specs = [
            pl.BlockSpec(uoh_np.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(voh_np.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    scratch = [pltpu.VMEM((wp + band, 128), jnp.float32)]
    if sparse:
        scratch.append(pltpu.SMEM((2, nbody * cap), jnp.float32))
    bits, m10, m01 = pl.pallas_call(
        functools.partial(kfn, quant, nbody, band),
        out_shape=(
            # bf16 bits: 0/1 exact, HALF the output footprint — at
            # band=32 XLA's memory-space assignment keeps the full bits
            # result in scoped VMEM, and the f32 version blew the 16 MiB
            # scoped limit (17.75M, hardware compile 08-20); bf16 fits.
            jax.ShapeDtypeStruct((g, nbody * cap, 256), jnp.bfloat16),
            jax.ShapeDtypeStruct((g, 1, nbody * cap), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, nbody * cap), jnp.float32),
        ),
        grid=(g,),
        in_specs=(
            [_block(q) for q in range(nq)]          # raw plane blocks
            + [_block(q) for q in range(nq)]        # blur plane blocks
            + [
                pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((_PP, _PP), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_PP, _PP), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 256), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 256), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            + extra_specs
        ),
        out_specs=(
            pl.BlockSpec((1, nbody * cap, 256), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbody * cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*([atlas] * nq + [blurred] * nq
        + [x0_g, ry_g, mu_t, mv_t, patx, paty] + extra_ops))
    bits = bits.reshape(g * nbody, cap, 256)[:nb]
    return (bits.astype(jnp.uint8),
            m10.reshape(g * nbody, cap)[:nb],
            m01.reshape(g * nbody, cap)[:nb])


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_windows(win_raw, win_blur, tbl_x0, rel_y, interpret: bool = False):
    """Extract CAP padded 32x32 patches per band from both window stacks.

    win_raw/win_blur: (NB, WIN, WP) band windows (ops/atlas.banded_extract's
    `windows()` views). tbl_x0: (NB, CAP) int32 column starts; rel_y:
    (NB, CAP) int32 window-relative row starts (0..BAND-1).

    Returns (raw, blur): (NB, CAP, _PP, _PP) f32 — [:31, :31] is the patch.
    """
    nb, _, wp = win_raw.shape
    cap = tbl_x0.shape[1]            # slots per band (static)
    j = jnp.arange(_PP, dtype=jnp.int32)
    # per-slot-lane column index; j >= 31 and parked slots never match
    x0v = tbl_x0[:, :, None] + j[None, None, :]
    x0v = jnp.where(j[None, None, :] < 31, x0v, -1_000_000)
    x0v = x0v.reshape(nb, 1, cap * _PP)

    wcat = jnp.concatenate([win_raw, win_blur], axis=1)      # (NB, 2W, WP)

    out_sd = jax.ShapeDtypeStruct((nb, _PP, cap * _PP), jnp.float32)
    raw, blur = pl.pallas_call(
        _extract_kernel,
        out_shape=(out_sd, out_sd),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, wcat.shape[1], wp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap * _PP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _PP, cap * _PP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PP, cap * _PP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(wcat, x0v, rel_y.astype(jnp.int32).reshape(nb, 1, cap))

    raw = raw.reshape(nb, _PP, cap, _PP).transpose(0, 2, 1, 3)
    blur = blur.reshape(nb, _PP, cap, _PP).transpose(0, 2, 1, 3)
    return raw, blur
