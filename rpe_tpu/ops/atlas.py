"""Pyramid atlas: all scale levels packed into one padded image.

Running detection per pyramid level pays every op's fixed cost 12 times and
forces 12 separate patch-gather dispatches. The atlas packs the levels
vertically (with dead gaps >= the patch radius) into a single
(H_atlas, W_pad) image, so the FAST/Harris rank kernel, the Gaussian blur,
and the descriptor patch extraction each run ONCE per image. Per-level
top-k selection still happens on static row slices of the atlas (quotas are
per level, reference ORB semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import level_shapes

GAP = 24  # dead rows between levels (> patch radius + blur radius)


@functools.lru_cache(maxsize=None)
def atlas_layout(h: int, w: int, nlevels: int, scale_factor: float):
    """Static layout: per-level (row_offset, h_l, w_l), total rows, padded W."""
    shapes = level_shapes(h, w, nlevels, scale_factor)
    offsets = []
    row = GAP
    for (lh, lw) in shapes:
        offsets.append((row, lh, lw))
        row += lh + GAP
    wp = -(-w // 128) * 128
    # pad rows so banded extraction windows stay in bounds for EVERY
    # legal band width (8/16/32): total divisible by 32 with >= 48 dead
    # rows at the bottom. (Round 5: was -(-row // 8) * 8 + 48 — the
    # value-identical change adds <= 40 all-parked pad rows, which carry
    # no keypoints and extract nothing.)
    total = -(-row // 32) * 32 + 64
    return tuple(offsets), total, wp


def build_atlas(levels, h: int, w: int, nlevels: int, scale_factor: float):
    """Stack pyramid levels into the atlas; returns (atlas, layout)."""
    offsets, total, wp = atlas_layout(h, w, nlevels, scale_factor)
    atlas = jnp.zeros((total, wp), dtype=levels[0].dtype)
    for lvl, (off, lh, lw) in zip(levels, offsets):
        atlas = jax.lax.dynamic_update_slice(atlas, lvl, (off, 0))
    return atlas, (offsets, total, wp)


# ---------------------------------------------------------------------------
# Fused pyramid+atlas build: bilinear resize as banded matmuls on the MXU
# ---------------------------------------------------------------------------


def _linear_resize_matrix(n_out: int, n_in: int):
    """(n_out, n_in) numpy f32 weights reproducing jax.image.resize
    method='linear' along one axis: half-pixel centers, triangle kernel
    dilated by the zoom factor when minifying (anti-aliased), edge weights
    renormalized. Verified exact vs jax.image.resize in f64 (~1e-11)."""
    scale = n_out / n_in
    x = (np.arange(n_out, dtype=np.float64) + 0.5) / scale - 0.5
    kscale = min(scale, 1.0)
    u = (np.arange(n_in, dtype=np.float64)[None, :] - x[:, None]) * kscale
    wts = np.maximum(0.0, 1.0 - np.abs(u))
    s = wts.sum(axis=1, keepdims=True)
    return np.where(s > 0, wts / s, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _atlas_resize_mats(h: int, w: int, nlevels: int, scale_factor: float):
    """Static resize operators for build_atlas_fused (numpy, never jnp —
    lru_cache + tracers don't mix). Returns (Rv, Cws): Rv (sum lh_{l>=1}, h)
    stacks every level>=1's vertical weights; Cws[l-1] is (w, lw_l)."""
    shapes = level_shapes(h, w, nlevels, scale_factor)
    if len(shapes) == 1:        # single-level pyramid: nothing to resize
        return np.zeros((0, h), np.float32), ()
    Rv = np.concatenate(
        [_linear_resize_matrix(lh, h) for (lh, _) in shapes[1:]], axis=0)
    Cws = tuple(_linear_resize_matrix(lw, w).T.copy()
                for (_, lw) in shapes[1:])
    return Rv, Cws


def build_atlas_fused(img, nlevels: int, scale_factor: float):
    """Pyramid + atlas in three MXU steps instead of 11 resizes + 12
    full-atlas dynamic_update_slice copies (~0.69 ms/image of the round-2
    stage budget, docs/PERF_LOG.md):

      1. one stacked banded matmul vertically resamples ALL levels >= 1,
      2. one small matmul per level horizontally resamples its row block,
      3. one concatenate assembles [gap, level, gap, ...] in layout order
         (gaps are fresh zero blocks; level 0 is the input, copied not
         recomputed).

    Bit-differences vs build_pyramid+build_atlas are bounded by matmul
    reassociation (~1e-4 absolute on [0,255] data) — the parity contract
    downstream is pose-level. Returns (atlas, layout) like build_atlas.
    """
    h, w = img.shape
    offsets, total, wp = atlas_layout(h, w, nlevels, scale_factor)
    Rv_np, Cws_np = _atlas_resize_mats(h, w, nlevels, scale_factor)
    v = jnp.asarray(Rv_np) @ img                       # (sum lh_{l>=1}, w)

    def padw(a):
        return jnp.pad(a, ((0, 0), (0, wp - a.shape[1])))

    segs = []
    row = 0          # rows emitted so far
    vrow = 0         # rows consumed from v
    for l, (off, lh, lw) in enumerate(offsets):
        segs.append(jnp.zeros((off - row, wp), img.dtype))
        if l == 0:
            segs.append(padw(img))
        else:
            blk = jax.lax.dynamic_slice_in_dim(v, vrow, lh, axis=0)
            segs.append(padw(blk @ jnp.asarray(Cws_np[l - 1])))
            vrow += lh
        row = off + lh
    segs.append(jnp.zeros((total - row, wp), img.dtype))
    return jnp.concatenate(segs, axis=0), (offsets, total, wp)


def gaussian_blur_rolled(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur as shifted adds (VPU-friendly; the
    single-channel conv_general_dilated route measured ~3 ms per frame —
    rolls cost microseconds). Edges wrap, which is safe on the atlas: all
    keypoints sit >= EDGE_MARGIN from level borders and levels are separated
    by GAP dead rows."""
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + float(k[i]) * jnp.roll(img, r - i, axis=0)
    out2 = jnp.zeros_like(out)
    for i in range(ksize):
        out2 = out2 + float(k[i]) * jnp.roll(out, r - i, axis=1)
    return out2


# ---------------------------------------------------------------------------
# Banded patch extraction: one-hot einsum instead of gathers
# ---------------------------------------------------------------------------

# Default banding geometry. `band` is a RUNTIME knob of banded_extract
# (OrbConfig.band; valid values 8/16/32): round-5 pooled banding — the
# extraction slot loop costs ~260 ns/slot regardless of per-slot work
# (v4/v5/v6 all rejected, docs/PERF_LOG.md), so slot COUNT is the only
# dial, and wider bands pool slot capacity over several 8-row bands:
# clustered rows borrow slots from sparse neighbors, so the same drop
# rate needs FEWER total slots (.scratch/pooled_occupancy_lab.py sizes
# caps per dataset). The Pallas transpose packing needs band*nbody <= 32
# (ops/fast.extract_nbody clamps).
BAND = 8         # default keypoint-center rows per band
CAP = 24         # default max keypoints per 8-row band (scales with band)
WIN = BAND + 32  # window rows per band (>= band + patch 31)


def banded_extract(atlas, blurred, xy, valid, patch: int = 31,
                   cap: int | None = None, band: int | None = None):
    """Extract `patch` x `patch` windows around xy from both atlases.

    atlas/blurred: (HA, WP) with HA % band == 0. xy: (K, 2) float (x, y)
    atlas coords (integer-valued); valid: (K,) bool.

    Returns (patches_raw, patches_blur, valid_out): (K, patch, patch) x2 —
    keypoints beyond a band's `cap` slots are zeroed and invalidated.
    `band` (default BAND=8; 8/16/32) sets the band row height — wider
    bands POOL slot capacity so clustered rows borrow slots from sparse
    neighbors (round-5 pooled banding; sizing tables in
    .scratch/pooled_occupancy_lab.py). `cap` (default CAP=24 scaled by
    band/8) sets the slots per band: the extraction stage costs
    ~NB*cap slots of VPU work (~260 ns each on v5e, docs/PERF_LOG.md
    round 4), while too small a cap drops clustered keypoints — measured
    drop rates per dataset/cap are in .scratch/cap_occupancy_lab.py
    output (e.g. 480x640 frames drop ~8% at cap 24 but ~3.5% at 32;
    1080p frames drop ~0% down to cap 20). Must be a multiple of 4
    (Pallas lane alignment: cap*32 % 128).

    Method: keypoints are bucketed by y-band (sorted once); band windows
    are *reshape views* of the atlas (no gather); per band-chunk the row and
    column selection are two one-hot einsums on the MXU. No scatter/gather
    primitives anywhere.
    """
    ha, wp = atlas.shape
    band_rows = BAND if band is None else int(band)
    assert band_rows in (8, 16, 32), f"band must be 8/16/32, got {band}"
    win = band_rows + 32
    nb = ha // band_rows
    k = xy.shape[0]
    r = patch // 2
    cap = CAP * band_rows // 8 if cap is None else int(cap)
    assert cap % 4 == 0 and cap > 0, (
        f"cap must be a positive multiple of 4, got {cap}")

    x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - r, 0, wp - patch)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - r, 0, ha - patch)
    band = jnp.clip(y0 // band_rows, 0, nb - 1)
    band = jnp.where(valid, band, nb - 1)  # park invalid kpts in last band

    order = jnp.argsort(band)                                 # (K,)
    band_sorted = jnp.take(band, order)
    # slot within band; beyond CAP -> dropped
    # position-in-run via cumsum trick: index - first-occurrence(band)
    first_idx = jnp.searchsorted(band_sorted, jnp.arange(nb))  # (NB,)
    pos = jnp.arange(k) - jnp.take(first_idx, band_sorted)
    keep = pos < cap
    slot = jnp.clip(pos, 0, cap - 1)

    # scatter sorted keypoints into (NB, CAP) tables. Dropped keypoints
    # (pos >= cap) are routed to the out-of-bounds sentinel nb*cap so
    # mode="drop" discards their writes — BEFORE round 5 they aliased
    # the band's LAST slot (clip to cap-1) and clobbered its rightful
    # keypoint's table entry with used=False: one valid-but-zero-
    # descriptor keypoint per over-full band, whose all-zero bits
    # cross-matched other poisoned keypoints at Hamming distance 0
    # (measured: 2 poisoned kpts on a 320x128 crop at nfeatures=512).
    flat = jnp.where(keep, band_sorted * cap + slot, nb * cap)
    tbl_x0 = jnp.zeros((nb * cap,), jnp.int32).at[flat].set(
        jnp.take(x0, order), mode="drop")
    tbl_y0 = jnp.zeros((nb * cap,), jnp.int32).at[flat].set(
        jnp.take(y0, order), mode="drop")
    tbl_used = jnp.zeros((nb * cap,), jnp.bool_).at[flat].set(
        keep & jnp.take(valid, order), mode="drop")
    tbl_x0 = tbl_x0.reshape(nb, cap)
    tbl_y0 = tbl_y0.reshape(nb, cap)
    tbl_used = tbl_used.reshape(nb, cap)

    # band windows as pure reshapes: window[b, q*BAND + s, :] =
    # atlas[(b + q) * BAND + s, :], q < WIN // BAND
    def windows(a):
        qs = []
        for q in range(win // band_rows):
            sl = jax.lax.dynamic_slice_in_dim(
                jnp.pad(a, ((0, win), (0, 0))), q * band_rows,
                nb * band_rows, axis=0)
            qs.append(sl.reshape(nb, band_rows, wp))
        return jnp.concatenate(qs, axis=1)                    # (NB, WIN, WP)

    win_raw = windows(atlas)
    win_blur = windows(blurred)

    # relative row offset of each keypoint inside its band window (needed by
    # both extraction backends). Live slots always land in 0..BAND-1
    # (band = y0 // BAND exactly); parked slots are forced to -31, the one
    # marker that yields ZEROS on every backend: the XLA rowoh below never
    # matches (crely + pj <= -1), and the Pallas kernels' 8-way sel never
    # fires. (The previous parked marker — the raw 0 - 8*band — extracted
    # a real x0=0 patch in band 0 and SHIFTED rows in bands 1-3 on the XLA
    # path only; all dead values, masked downstream, but the sparse kernel
    # needs rel_y < 0 as its skip predicate, so make it uniform.)
    _band_base = (jnp.arange(nb) * band_rows)[:, None]        # (NB, 1)
    _rel_y = jnp.where(tbl_used, tbl_y0 - _band_base, -31)    # (NB, CAP)

    import os

    from .fast import _use_pallas, kernel_gate

    # RPE_PALLAS_INTERPRET=1 forces the Pallas paths in interpret mode on
    # any backend (CPU end-to-end parity tests); production TPU runs leave
    # it unset.
    _interp = bool(os.environ.get("RPE_PALLAS_INTERPRET"))
    _want_extract = kernel_gate("RPE_PALLAS_EXTRACT")
    _want_t = kernel_gate("RPE_EXTRACT_T")
    if (_use_pallas() or _interp) and (_want_extract or _want_t):
        # Pallas extraction backends (ops/extract_pallas.py); the XLA path
        # below materializes ~1.4 GB/image of one-hot operands in HBM.
        # Every family here is hardware-validated (bit-parity on the real
        # chip, 08-18) and ON by default on TPU — kernel_gate() env vars
        # fall back to the XLA path. RPE_EXTRACT_T selects the
        # transposed kernel ON ITS OWN (it does not need the one-hot
        # kernel's RPE_PALLAS_EXTRACT — requiring both silently no-op'd the
        # first hardware validation of the T family, 08-18).
        slot_of_sorted = jnp.where(keep, flat, 0)             # (K,)
        valid_sorted = jnp.take(valid, order) & keep
        if _want_t and kernel_gate("RPE_EXTRACT_T_BRIEF"):
            # v3: v2 plus steered BRIEF in-kernel — descriptor patches
            # never reach HBM and the XLA one-hot BRIEF einsum stage
            # disappears. Bits match steered_brief_t exactly in interpret
            # mode; on hardware, Mosaic/XLA transcendental ULP differences
            # can flip a sample only on a round() boundary (the hardware
            # validation gate is bit-agreement > 0.999 + pose parity).
            from .extract_pallas import extract_windows_t_brief
            from .fast import extract_nbody

            bits, m10, m01 = extract_windows_t_brief(
                atlas, blurred, tbl_x0, _rel_y, interpret=_interp,
                band=band_rows, nbody=extract_nbody(band_rows),
                diet=kernel_gate("RPE_EXTRACT_T_BRIEF_V4"),
                sparse=kernel_gate("RPE_EXTRACT_T_SPARSE"),
                quad=kernel_gate("RPE_EXTRACT_T_QUAD"),
                binned=kernel_gate("RPE_EXTRACT_T_V7"),
                quadsamp=kernel_gate("RPE_EXTRACT_T_V8"))
            return {
                "patches_raw": None,
                "patches_blur": None,
                "bits": bits.reshape(nb * cap, 256),
                "m10": m10.reshape(nb * cap),
                "m01": m01.reshape(nb * cap),
                "slot_of_sorted": slot_of_sorted,
                "order": order,
                "valid_sorted": valid_sorted,
            }
        if _want_t:
            # v2: zero-FLOP transposed extraction fed straight from the
            # atlases (no windows() materialization); moments in-kernel,
            # blur patches TRANSPOSED — paired with orb.steered_brief_t.
            # (reaching past here implies _want_extract: the one-hot
            # kernel family below)
            from .extract_pallas import extract_windows_t
            from .fast import extract_nbody

            blurp_t, m10, m01 = extract_windows_t(
                atlas, blurred, tbl_x0, _rel_y, interpret=_interp,
                band=band_rows, nbody=extract_nbody(band_rows))
            blur_t = blurp_t[:, :, :patch, :patch].reshape(
                nb * cap, patch, patch)
            return {
                "patches_raw": None,
                "patches_blur": None,
                "patches_blur_t": blur_t,
                "m10": m10.reshape(nb * cap),
                "m01": m01.reshape(nb * cap),
                "slot_of_sorted": slot_of_sorted,
                "order": order,
                "valid_sorted": valid_sorted,
            }
        if kernel_gate("RPE_EXTRACT_MOMENTS"):
            # further fusion: IC-orientation moments in-kernel; the raw
            # patches (whose only consumer is the orientation) never
            # reach HBM
            from .extract_pallas import extract_windows_moments

            blurp, m10, m01 = extract_windows_moments(
                win_raw, win_blur, tbl_x0, _rel_y, interpret=_interp)
            blur = blurp[:, :, :patch, :patch].reshape(
                nb * cap, patch, patch)
            return {
                "patches_raw": None,
                "patches_blur": blur,
                "m10": m10.reshape(nb * cap),
                "m01": m01.reshape(nb * cap),
                "slot_of_sorted": slot_of_sorted,
                "order": order,
                "valid_sorted": valid_sorted,
            }
        from .extract_pallas import extract_windows

        rawp, blurp = extract_windows(win_raw, win_blur, tbl_x0, _rel_y,
                                      interpret=_interp)
        raw = rawp[:, :, :patch, :patch].reshape(nb * cap, patch, patch)
        blur = blurp[:, :, :patch, :patch].reshape(nb * cap, patch, patch)
        return {
            "patches_raw": raw,
            "patches_blur": blur,
            "slot_of_sorted": slot_of_sorted,
            "order": order,
            "valid_sorted": valid_sorted,
        }

    lane = jnp.arange(wp)
    row = jnp.arange(win)
    pj = jnp.arange(patch)
    rel_y = _rel_y                                            # (NB, CAP)

    # RPE_ONEHOT_BF16=1: materialize the one-hot operands (this stage's
    # measured HBM bound, ~1.4 GB/image f32) in bf16. 0/1 values are exact
    # in bf16 and jnp's promotion re-converts to f32 before the dot, so
    # results are BIT-IDENTICAL on every backend; whether the TPU actually
    # halves the traffic (vs materializing the f32 convert) is pending a
    # hardware stage probe — opt-in until measured.
    _oh_dtype = (jnp.bfloat16 if os.environ.get("RPE_ONEHOT_BF16")
                 else jnp.float32)

    def per_band_chunk(wr, wb, cx0, crely):
        # wr/wb (NBC, WIN, WP); cx0/crely (NBC, CAP)
        # column one-hot: (NBC, WP, CAP*patch)
        col = (lane[None, :, None, None]
               == (cx0[:, None, :, None] + pj[None, None, None, :]))
        col = col.astype(_oh_dtype).reshape(wr.shape[0], wp, -1)
        # row one-hot: (NBC, CAP, patch, WIN)
        rowoh = (row[None, None, None, :]
                 == (crely[:, :, None, None] + pj[None, None, :, None]))
        rowoh = rowoh.astype(_oh_dtype)

        # One-hot selection MUST run at HIGHEST precision: TPU DEFAULT
        # matmul truncates f32 inputs to single-pass bf16, which QUANTIZES
        # every extracted pixel to 8 mantissa bits (measured 08-18 on the
        # real chip: max |err| 0.5 on 0..255 pixels, every patch affected —
        # the "bf16x3 is the default" belief this comment used to state was
        # wrong). HIGHEST (3-pass decomposition) reproduces f32 exactly for
        # a 0/1 selection operand; the stage is bound by one-hot operand
        # traffic, not MXU passes. Raw and blurred windows are STACKED
        # along the row axis so the lane-selection matmul runs once at
        # M=2*WIN=80.
        wcat = jnp.concatenate([wr, wb], axis=1)              # (NBC, 2W, WP)
        t = jnp.einsum("bvx,bxm->bvm", wcat, col,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        t = t.reshape(wr.shape[0], 2, win, cap, patch)

        def sel_rows(tw):
            # rows: (NBC, CAP, patch_i, patch_j)
            return jnp.einsum("bciv,bvcj->bcij", rowoh, tw,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

        return sel_rows(t[:, 0]), sel_rows(t[:, 1])

    nbc = 10  # bands per chunk (memory: col one-hot ~ WP*CAP*patch*4B*nbc)
    nb_pad = -(-nb // nbc) * nbc
    pad = nb_pad - nb

    def padb(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    wr_c = padb(win_raw).reshape(-1, nbc, win, wp)
    wb_c = padb(win_blur).reshape(-1, nbc, win, wp)
    x0_c = padb(tbl_x0).reshape(-1, nbc, cap)
    ry_c = padb(rel_y).reshape(-1, nbc, cap)

    raw_c, blur_c = jax.lax.map(
        lambda t: per_band_chunk(*t), (wr_c, wb_c, x0_c, ry_c))
    raw = raw_c.reshape(nb_pad * cap, patch, patch)[: nb * cap]
    blur = blur_c.reshape(nb_pad * cap, patch, patch)[: nb * cap]

    # Patches live in band-slot space (S = NB*CAP); descriptor math runs
    # there (keypoint order is irrelevant downstream). `slot_of_sorted`
    # maps sorted-keypoint index -> slot; reorder small per-keypoint arrays
    # (xy, scores) with `order` and fetch per-keypoint results from slot
    # space with `slot_of_sorted` — no large patch gather anywhere.
    slot_of_sorted = jnp.where(keep, flat, 0)                 # (K,)
    valid_sorted = jnp.take(valid, order) & keep
    return {
        "patches_raw": raw,          # (S, p, p) slot space
        "patches_blur": blur,
        "slot_of_sorted": slot_of_sorted,
        "order": order,              # original-index of sorted keypoint i
        "valid_sorted": valid_sorted,
        # slot tables, exposed so hardware parity probes can drive the
        # Pallas extraction kernels on the exact same inputs
        "tbl_x0": tbl_x0,            # (NB, CAP) int32 column starts
        "rel_y": _rel_y,             # (NB, CAP) int32 in-window row starts
        "tbl_used": tbl_used,        # (NB, CAP) bool live-slot mask
    }
