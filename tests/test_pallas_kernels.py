"""Pallas kernels vs their XLA reference formulations (interpret mode on CPU;
the real-TPU path is exercised by bench.py / the driver)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from rpe_tpu.ops.fast import (
    fast_score_map,
    harris_response_map,
    nonmax_suppress_3x3,
)
from rpe_tpu.ops.fast_pallas import fast_harris_rank_map

IMG = "/root/reference/evaluation-runs/single-pair/images/000000.png"


@pytest.fixture(scope="module")
def gray():
    return cv2.imread(IMG, cv2.IMREAD_GRAYSCALE).astype(np.float32)


def test_fused_fast_harris_matches_xla(gray):
    img = jnp.asarray(gray)
    rank_p, blur_p = fast_harris_rank_map(img, 15.0, interpret=True)
    rank_p = np.asarray(rank_p)
    score = nonmax_suppress_3x3(fast_score_map(img, 15.0))
    harris = harris_response_map(img)
    rank_x = np.asarray(jnp.where(score > 0.0, harris, -jnp.inf))

    m = 8  # borders are masked downstream by detect_level's margin
    a, b = rank_p[m:-m, m:-m], rank_x[m:-m, m:-m]
    fa, fb = np.isfinite(a), np.isfinite(b)
    np.testing.assert_array_equal(fa, fb)  # identical corner sets
    sel = fa
    rel = np.abs(a[sel] - b[sel]) / (np.abs(b[sel]) + 1e-3)
    assert rel.max() < 1e-3


def test_fused_kernel_odd_sizes(gray):
    # non-multiple-of-tile heights and non-128-multiple widths
    img = jnp.asarray(gray[:301, :473])
    rank, blur = fast_harris_rank_map(img, 15.0, interpret=True)
    rank = np.asarray(rank)
    assert rank.shape == (301, 473)
    assert np.asarray(blur).shape == (301, 473)
    assert np.isfinite(rank).sum() > 50


def test_fused_blur_matches_reference(gray):
    import cv2 as _cv2

    img = jnp.asarray(gray)
    _, blur = fast_harris_rank_map(img, 15.0, interpret=True)
    ref = _cv2.GaussianBlur(gray, (7, 7), 2.0,
                            borderType=_cv2.BORDER_REFLECT_101)
    m = 8  # kernel edges replicate/wrap; interior must match
    np.testing.assert_allclose(np.asarray(blur)[m:-m, m:-m],
                               ref[m:-m, m:-m], atol=0.05)


def _five_point_coeffs(rng, B):
    """Row-normalized constraint coefficient batch from synthetic minimal
    problems (same construction as five_point_essential)."""
    import jax
    from rpe_tpu.geometry.five_point import (
        _build_constraint_coeffs, _householder_null4)
    from rpe_tpu.geometry.epipolar import _build_epipolar_rows
    from rpe_tpu.geometry import so3_exp

    p1s, p2s = [], []
    for _ in range(B):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * np.deg2rad(rng.uniform(2, 30))
        R = np.asarray(so3_exp(w))
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        X = rng.uniform([-2, -2, 3], [2, 2, 10], size=(5, 3))
        x1 = X / X[:, 2:3]
        X2 = X @ R.T + t
        x2 = X2 / X2[:, 2:3]
        p1s.append(x1[:, :2].astype(np.float32))
        p2s.append(x2[:, :2].astype(np.float32))
    A = _build_epipolar_rows(jnp.asarray(np.stack(p1s)),
                             jnp.asarray(np.stack(p2s)))
    coeffs = _build_constraint_coeffs(_householder_null4(A))
    rn = jnp.sqrt(jnp.sum(coeffs * coeffs, axis=-1, keepdims=True) + 1e-20)
    return coeffs / rn


def test_five_point_root_kernel_matches_xla():
    """ops/five_point_pallas.find_root_brackets vs the XLA grid+bisect path:
    identical bracket flags, endpoints within one final-bisection width."""
    import jax
    from rpe_tpu.geometry.five_point import (
        _detM_at, BISECT_ITERS, GRID, MAX_ROOTS)
    from rpe_tpu.ops.five_point_pallas import find_root_brackets

    rng = np.random.default_rng(3)
    B = 9
    coeffs = _five_point_coeffs(rng, B)

    t = jnp.linspace(-0.5 * jnp.pi + 1e-3, 0.5 * jnp.pi - 1e-3, GRID)
    d = _detM_at(coeffs[:, None], jnp.broadcast_to(jnp.tan(t), (B, GRID)))
    sign = jnp.sign(d)
    change = (sign[..., :-1] * sign[..., 1:]) < 0
    score = jnp.where(change, -jnp.arange(GRID - 1, dtype=jnp.float32),
                      -jnp.inf)
    _, bidx = jax.lax.top_k(score, MAX_ROOTS)
    has_x = jnp.take_along_axis(change, bidx, axis=-1)
    t_lo_x = jnp.take(t, bidx)
    t_hi_x = jnp.take(t, bidx + 1)
    d_lo = jnp.take_along_axis(d, bidx, axis=-1)

    def body(_, carry):
        lo, hi, dlo = carry
        mid = 0.5 * (lo + hi)
        dm = _detM_at(coeffs[:, None], jnp.tan(mid))
        same = (jnp.sign(dm) * jnp.sign(dlo)) >= 0
        return (jnp.where(same, mid, lo), jnp.where(same, hi, mid),
                jnp.where(same, dm, dlo))

    t_lo_x, t_hi_x, _ = jax.lax.fori_loop(0, BISECT_ITERS, body,
                                          (t_lo_x, t_hi_x, d_lo))

    t_lo_p, t_hi_p, has_p = find_root_brackets(coeffs, interpret=True)
    np.testing.assert_array_equal(np.asarray(has_x), np.asarray(has_p))
    m = np.asarray(has_x)
    # Same grid interval always (the kernel computes sign via the pivot
    # product, which can flip vs the det *value* at a near-zero midpoint,
    # shifting a few final bisection steps — the GN polish converges from
    # anywhere inside the interval); most roots bit-track the XLA path.
    dt = float(np.pi / (GRID - 1))
    width = dt / (1 << BISECT_ITERS)
    dlo = np.abs(np.asarray(t_lo_x)[m] - np.asarray(t_lo_p)[m])
    dhi = np.abs(np.asarray(t_hi_x)[m] - np.asarray(t_hi_p)[m])
    assert dlo.max() <= dt and dhi.max() <= dt
    assert (dlo <= 2 * width).mean() > 0.9
    assert (dhi <= 2 * width).mean() > 0.9


def test_five_point_fused_solve_matches_xla():
    """solve_roots_polished (in-kernel extraction + GN) vs the XLA
    null-vector + _gn_refine path: every valid root must satisfy the cubic
    constraint system to f32 precision, and the XLA path's converged roots
    must be reproduced (same z up to polish tolerance)."""
    import jax
    from rpe_tpu.geometry.five_point import (
        _M3, _flip_table, MAX_ROOTS)
    from rpe_tpu.ops.five_point_pallas import solve_roots_polished

    rng = np.random.default_rng(5)
    B = 9
    coeffs = _five_point_coeffs(rng, B)

    x, y, rv, flip, has = (np.asarray(a) for a in
                           solve_roots_polished(coeffs, interpret=True))

    # residuals in each root's chart
    cn = np.asarray(coeffs).astype(np.float64)
    P = _flip_table().astype(np.float64)
    n_checked = 0
    for b in range(B):
        for r in range(MAX_ROOTS):
            if not has[b, r]:
                continue
            c = cn[b] @ P if flip[b, r] else cn[b]
            m = np.array([x[b, r] ** a * y[b, r] ** bb * rv[b, r] ** cc
                          for (a, bb, cc) in _M3])
            res = np.abs(c @ m).max()
            scale = max(1.0, abs(x[b, r]), abs(y[b, r]), abs(rv[b, r])) ** 3
            assert res < 2e-4 * scale, (b, r, res, scale)
            n_checked += 1
    assert n_checked >= 3 * B  # synthetic minimal problems have many roots

    # chart consistency with the XLA path's tan-grid coverage: z (tan of
    # the polished root) in the affine frame must lie inside the grid the
    # XLA formulation scans — no env gating needed, this is a pure check
    # on the kernel's outputs (the old RPE_NO_PALLAS_5PT dance here was
    # dead residue of the pre-opt-in gating and forced nothing)
    z_kernel = np.where(flip, 1.0 / np.where(np.abs(rv) > 1e-12, rv, 1.0),
                        rv)
    assert np.all(np.abs(z_kernel[has]) < 1.2e3)


def test_extract_windows_kernel_matches_direct_slices():
    """ops/extract_pallas.extract_windows (VMEM one-hot selection) vs
    direct window slicing: bit-identical patches."""
    from rpe_tpu.ops.atlas import CAP, WIN, BAND
    from rpe_tpu.ops.extract_pallas import extract_windows

    rng = np.random.default_rng(0)
    nb, wp, patch = 6, 256, 31
    win_raw = rng.uniform(0, 255, (nb, WIN, wp)).astype(np.float32)
    win_blur = rng.uniform(0, 255, (nb, WIN, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch, (nb, CAP)).astype(np.int32)
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)

    raw, blur = extract_windows(jnp.asarray(win_raw), jnp.asarray(win_blur),
                                jnp.asarray(tbl_x0), jnp.asarray(rel_y),
                                interpret=True)
    raw = np.asarray(raw)[:, :, :patch, :patch]
    blur = np.asarray(blur)[:, :, :patch, :patch]
    for b in range(nb):
        for c in range(CAP):
            y0, x0 = rel_y[b, c], tbl_x0[b, c]
            np.testing.assert_array_equal(
                raw[b, c], win_raw[b, y0:y0 + patch, x0:x0 + patch])
            np.testing.assert_array_equal(
                blur[b, c], win_blur[b, y0:y0 + patch, x0:x0 + patch])


def test_extract_windows_moments_matches_ic_angles():
    """extract_windows_moments: blurred patches bit-identical to
    extract_windows; in-kernel IC moments match ops/orb.ic_angles on the
    directly-sliced raw patches to f32-reassociation tolerance."""
    from rpe_tpu.ops.atlas import CAP, WIN, BAND
    from rpe_tpu.ops.extract_pallas import (
        extract_windows,
        extract_windows_moments,
    )
    from rpe_tpu.ops.orb import ic_angles

    rng = np.random.default_rng(1)
    nb, wp, patch = 5, 256, 31
    win_raw = rng.uniform(0, 255, (nb, WIN, wp)).astype(np.float32)
    win_blur = rng.uniform(0, 255, (nb, WIN, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch, (nb, CAP)).astype(np.int32)
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)

    raw_ref, blur_ref = extract_windows(
        jnp.asarray(win_raw), jnp.asarray(win_blur),
        jnp.asarray(tbl_x0), jnp.asarray(rel_y), interpret=True)
    blur, m10, m01 = extract_windows_moments(
        jnp.asarray(win_raw), jnp.asarray(win_blur),
        jnp.asarray(tbl_x0), jnp.asarray(rel_y), interpret=True)
    np.testing.assert_array_equal(np.asarray(blur), np.asarray(blur_ref))

    ang_ref = np.asarray(ic_angles(
        jnp.asarray(np.asarray(raw_ref)[:, :, :patch, :patch]
                    .reshape(nb * CAP, patch, patch))))
    ang = np.arctan2(np.asarray(m01).reshape(-1), np.asarray(m10).reshape(-1))
    # moments reorder f32 sums; angles agree far below the steered-BRIEF
    # rotation quantization
    d = np.abs(np.angle(np.exp(1j * (ang - ang_ref))))
    assert d.max() < 1e-4, d.max()


def test_orb_atlas_moments_path_end_to_end(gray):
    """Full ORB detection with RPE_PALLAS_EXTRACT + RPE_EXTRACT_MOMENTS
    (forced, interpret): same keypoints as the XLA path, descriptors equal
    on ~all slots (angle ulp differences may flip rounded pattern coords
    on rare near-half-integer rotations)."""
    import os
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import rpe_tpu.ops.fast as fast_mod
    from rpe_tpu.ops.orb import orb_detect_and_describe

    img = jnp.asarray(gray[:160, :192])
    ref = orb_detect_and_describe(img, nfeatures=500, max_kpts=512)

    with mock.patch.object(fast_mod, "_use_pallas", lambda: True), \
         mock.patch.dict(os.environ, {"RPE_PALLAS_EXTRACT": "1",
                                      "RPE_EXTRACT_MOMENTS": "1",
                                      "RPE_NO_PALLAS": ""}), \
         pltpu.force_tpu_interpret_mode():
        got = orb_detect_and_describe(img, nfeatures=500, max_kpts=512)

    vr = np.asarray(ref["valid"])
    vg = np.asarray(got["valid"])
    assert vg.sum() > 0.9 * vr.sum()
    # same keypoint positions (order-free)
    rset = {tuple(p) for p in np.round(np.asarray(ref["xy"])[vr]).astype(int)}
    gxy = np.round(np.asarray(got["xy"])[vg]).astype(int)
    assert np.mean([tuple(p) in rset for p in gxy]) > 0.9
    # descriptors: overwhelming bit agreement on common keypoints (keyed by
    # (x, y, level) — base coords alone collide across pyramid levels — and
    # skipping ambiguous duplicate keys)
    from collections import Counter

    bits_r = np.asarray(ref["bits"])[vr]
    bits_g = np.asarray(got["bits"])[vg]
    lev_r = np.asarray(ref["level"])[vr]
    lev_g = np.asarray(got["level"])[vg]
    keys_r = [tuple(p) + (int(l),) for p, l in zip(
        np.round(np.asarray(ref["xy"])[vr]).astype(int), lev_r)]
    keys_g = [tuple(p) + (int(l),) for p, l in zip(gxy, lev_g)]
    dup_r = {k for k, c in Counter(keys_r).items() if c > 1}
    dup_g = {k for k, c in Counter(keys_g).items() if c > 1}
    key_r = {k: i for i, k in enumerate(keys_r) if k not in dup_r}
    agree = [
        (bits_r[key_r[k]] == bits_g[i]).mean()
        for i, k in enumerate(keys_g)
        if k in key_r and k not in dup_g
    ]
    assert len(agree) > 100
    assert np.mean(agree) > 0.999, np.mean(agree)


def test_extract_windows_t_matches_direct_slices():
    """ops/extract_pallas.extract_windows_t (zero-FLOP transposed
    extraction fed straight from the atlases) vs direct slicing:
    transposed blur patches bit-identical, in-kernel IC moments match the
    mask sums on directly-sliced raw patches."""
    from rpe_tpu.ops.atlas import BAND, CAP, WIN
    from rpe_tpu.ops.extract_pallas import extract_windows_t
    from rpe_tpu.ops.orb import _ic_angle_masks

    rng = np.random.default_rng(7)
    nb, wp, patch = 16, 256, 31
    ha = nb * BAND
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch + 1, (nb, CAP)).astype(np.int32)
    tbl_x0[0, 0] = wp - patch          # right-edge slice must stay exact
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)

    blur_t, m10, m01 = extract_windows_t(
        jnp.asarray(atlas), jnp.asarray(blurred),
        jnp.asarray(tbl_x0), jnp.asarray(rel_y), interpret=True)
    blur_t = np.asarray(blur_t)
    m10, m01 = np.asarray(m10), np.asarray(m01)

    mask, us, vs = _ic_angle_masks()
    # bands whose 5-block window would overrun the atlas read clamped data
    # (only ever parked keypoints in production) — assert the rest
    for b in range(nb - WIN // BAND):
        for c in range(CAP):
            y0 = b * BAND + rel_y[b, c]
            x0 = tbl_x0[b, c]
            raw = atlas[y0:y0 + patch, x0:x0 + patch]
            np.testing.assert_array_equal(
                blur_t[b, c, :patch, :patch].T,
                blurred[y0:y0 + patch, x0:x0 + patch])
            # the u/v weights are antisymmetric, so the moment sums cancel
            # ~3800-scale terms down to ~1e2 — f32 reassociation noise is
            # ~|terms|*eps*sqrt(n) ~ 1e0 absolute (the semantically
            # meaningful angle-level gate lives in the end-to-end test)
            np.testing.assert_allclose(
                m10[b, c], float(np.sum(raw * mask * us)), rtol=1e-3,
                atol=2.0)
            np.testing.assert_allclose(
                m01[b, c], float(np.sum(raw * mask * vs)), rtol=1e-3,
                atol=2.0)


def test_steered_brief_t_bit_identical():
    """steered_brief_t(transpose(patches)) must reproduce
    steered_brief(patches) bit for bit (same one-hot-selected scalars)."""
    from rpe_tpu.ops.orb import steered_brief, steered_brief_t

    rng = np.random.default_rng(11)
    k = 64
    patches = rng.uniform(0, 255, (k, 31, 31)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, (k,)).astype(np.float32)
    a = np.asarray(steered_brief(jnp.asarray(patches), jnp.asarray(angles)))
    b = np.asarray(steered_brief_t(
        jnp.asarray(patches).transpose(0, 2, 1), jnp.asarray(angles)))
    np.testing.assert_array_equal(a, b)


def test_extract_t_end_to_end_descriptor_parity(gray):
    """Full atlas ORB with RPE_EXTRACT_T=1 (transposed kernel + brief_t)
    vs the ungated XLA path: same keypoints/validity, >= 99.9% descriptor
    bit agreement (moment reassociation can nudge angles ~1e-4, flipping
    the odd rounded pattern index)."""
    import os
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import rpe_tpu.ops.fast as fast_mod
    from rpe_tpu.ops.orb import orb_detect_and_describe_atlas

    img = jnp.asarray(gray[:160, :192])
    # both runs share the (mocked) Pallas rank path so the ONLY difference
    # is the extraction backend: moments kernel vs transposed-T kernel
    with mock.patch.object(fast_mod, "_use_pallas", lambda: True), \
         mock.patch.dict(os.environ, {"RPE_PALLAS_EXTRACT": "1",
                                      "RPE_EXTRACT_MOMENTS": "1",
                                      "RPE_NO_PALLAS": ""}), \
         pltpu.force_tpu_interpret_mode():
        ref = orb_detect_and_describe_atlas(img, nfeatures=500, nlevels=4,
                                            max_kpts=512)

    with mock.patch.object(fast_mod, "_use_pallas", lambda: True), \
         mock.patch.dict(os.environ, {"RPE_PALLAS_EXTRACT": "1",
                                      "RPE_EXTRACT_T": "1",
                                      "RPE_NO_PALLAS": ""}), \
         pltpu.force_tpu_interpret_mode():
        got = orb_detect_and_describe_atlas(img, nfeatures=500, nlevels=4,
                                            max_kpts=512)

    vr = np.asarray(ref["valid"])
    vg = np.asarray(got["valid"])
    np.testing.assert_array_equal(vr, vg)
    np.testing.assert_allclose(np.asarray(ref["xy"])[vr],
                               np.asarray(got["xy"])[vg])
    bits_r = np.asarray(ref["bits"])[vr]
    bits_g = np.asarray(got["bits"])[vg]
    assert vr.sum() > 100
    agree = (bits_r == bits_g).mean()
    assert agree > 0.999, agree
    ang_r = np.asarray(ref["angle"])[vr]
    ang_g = np.asarray(got["angle"])[vg]
    d = np.abs(np.angle(np.exp(1j * (ang_r - ang_g))))
    assert d.max() < 1e-3, d.max()


def test_extract_t_brief_kernel_bit_identical():
    """extract_windows_t_brief (v3: steered BRIEF in-kernel) vs
    extract_windows_t + orb.steered_brief_t on the same inputs: the bits
    and moments must be bit-identical in interpret mode (identical one-hot
    selection contractions and identical atan2/cos/sin/round op chain)."""
    from rpe_tpu.ops.atlas import BAND, CAP
    from rpe_tpu.ops.extract_pallas import (extract_windows_t,
                                            extract_windows_t_brief)
    from rpe_tpu.ops.orb import steered_brief_t

    rng = np.random.default_rng(23)
    nb, wp, patch = 16, 256, 31
    ha = nb * BAND
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch + 1, (nb, CAP)).astype(np.int32)
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)

    blur_t, m10, m01 = extract_windows_t(
        jnp.asarray(atlas), jnp.asarray(blurred),
        jnp.asarray(tbl_x0), jnp.asarray(rel_y), interpret=True)
    angles = jnp.arctan2(m01.reshape(-1), m10.reshape(-1))
    ref_bits = np.asarray(steered_brief_t(
        blur_t[:, :, :patch, :patch].reshape(nb * CAP, patch, patch),
        angles)).reshape(nb, CAP, 256)

    bits, m10b, m01b = extract_windows_t_brief(
        jnp.asarray(atlas), jnp.asarray(blurred),
        jnp.asarray(tbl_x0), jnp.asarray(rel_y), interpret=True)
    np.testing.assert_array_equal(np.asarray(m10b), np.asarray(m10))
    np.testing.assert_array_equal(np.asarray(m01b), np.asarray(m01))
    np.testing.assert_array_equal(np.asarray(bits), ref_bits)

    # cv2-interop quantization mode must stay in lockstep with
    # orb._brief_bits (jnp.round before the compare, in and out of kernel).
    # quant is an explicit static arg on the kernel side (an env flip
    # would NOT retrace: jax's jit cache is keyed by callable identity).
    import os
    from unittest import mock

    with mock.patch.dict(os.environ, {"RPE_BRIEF_QUANT": "1"}):
        ref_q = np.asarray(steered_brief_t(
            blur_t[:, :, :patch, :patch].reshape(nb * CAP, patch, patch),
            angles)).reshape(nb, CAP, 256)
    bits_q, _, _ = extract_windows_t_brief(
        jnp.asarray(atlas), jnp.asarray(blurred),
        jnp.asarray(tbl_x0), jnp.asarray(rel_y), interpret=True,
        quant=True)
    assert (np.asarray(bits_q) != np.asarray(bits)).any()
    np.testing.assert_array_equal(np.asarray(bits_q), ref_q)


@pytest.mark.parametrize("nbody", [1, 4])
@pytest.mark.parametrize("quant", [False, True])
def test_extract_t_brief_diet_bit_identical(nbody, quant):
    """_extract_t_brief_kernel_v4 (slot diet: no blur extraction, ry
    folded into the sampling one-hot, both BRIEF points in one K=40 dot)
    vs the v3 kernel: bits and moments bit-identical — the diet only
    restructures exact one-hot selections."""
    from rpe_tpu.ops.atlas import BAND, CAP
    from rpe_tpu.ops.extract_pallas import extract_windows_t_brief

    rng = np.random.default_rng(31 + nbody)
    nb, wp, patch = 13, 256, 31
    ha = nb * BAND
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch + 1, (nb, CAP)).astype(np.int32)
    tbl_x0[0, 0] = wp - patch
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)
    args = (jnp.asarray(atlas), jnp.asarray(blurred),
            jnp.asarray(tbl_x0), jnp.asarray(rel_y))

    base = extract_windows_t_brief(*args, interpret=True, nbody=nbody,
                                   quant=quant)
    out = extract_windows_t_brief(*args, interpret=True, nbody=nbody,
                                  quant=quant, diet=True)
    for a, b in zip(base, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("nbody", [1, 4])
@pytest.mark.parametrize("quant", [False, True])
def test_extract_t_brief_sparse_bit_identical(nbody, quant):
    """_extract_t_brief_kernel_sparse (occupancy predication: every slot
    body under @pl.when(rel_y >= 0), parked slots skipped outright) vs
    the v3 kernel: bits and moments bit-identical. ~half the slots here
    are parked (rel_y = -31, the banded_extract parked marker) to
    exercise both sides of the predicate; live slots run the identical
    op chain, skipped slots must produce the zeros v3 computes for
    them."""
    from rpe_tpu.ops.atlas import BAND, CAP
    from rpe_tpu.ops.extract_pallas import extract_windows_t_brief

    rng = np.random.default_rng(41 + nbody)
    nb, wp, patch = 13, 256, 31
    ha = nb * BAND
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch + 1, (nb, CAP)).astype(np.int32)
    tbl_x0[0, 0] = wp - patch          # right-edge slice must stay exact
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)
    parked = rng.uniform(size=(nb, CAP)) < 0.5
    parked[0, 0] = False               # keep the edge-slice slot live
    rel_y = np.where(parked, -31, rel_y).astype(np.int32)
    tbl_x0 = np.where(parked, 0, tbl_x0).astype(np.int32)
    args = (jnp.asarray(atlas), jnp.asarray(blurred),
            jnp.asarray(tbl_x0), jnp.asarray(rel_y))

    base = extract_windows_t_brief(*args, interpret=True, nbody=nbody,
                                   quant=quant)
    out = extract_windows_t_brief(*args, interpret=True, nbody=nbody,
                                  quant=quant, sparse=True)
    for a, b in zip(base, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # parked slots must be exact zeros on both paths (the downstream
    # valid mask is belt-and-braces, not load-bearing, for these)
    assert not np.asarray(base[0]).reshape(nb * CAP, 256)[
        parked.reshape(-1)].any()
    assert not np.asarray(out[0]).reshape(nb * CAP, 256)[
        parked.reshape(-1)].any()


@pytest.mark.parametrize("nbody", [1, 4])
@pytest.mark.parametrize("quant", [False, True])
def test_extract_t_brief_quad_bit_identical(nbody, quant):
    """_extract_t_brief_kernel_quad (v6: 4-slot MXU block one-hot
    row-select instead of per-slot masked slice-FMAs) vs the v3 kernel.

    The selected patch VALUES are exact (single-nonzero one-hot columns
    at HIGHEST), but the IC moment reduction `jnp.sum(raw_t * mu)` fuses
    with a different producer graph, and XLA-CPU's vectorizer then picks
    a different f32 accumulation order: moments differ at reassociation
    level (~3e-7 of the term-magnitude sum — measured 0.24 absolute on
    |m|~3000 with ~7e5 term mass), which flips BRIEF bits only where the
    ULP-shifted angle crosses a round() boundary (3/79872 = 0.004%
    measured). So this test asserts VALUE correctness: moments allclose
    at reassociation tolerance, bits >= 99.9% agreement, parked slots
    exact zeros (the -1000 offset sentinel — 8j + ry + blur_base + v can
    reach a live lane at j >= 1 without it). Whether Mosaic's on-chip
    reduction is producer-independent (=> full 1.00000 bit-agreement) is
    decided by the hardware validation gate, which for this family is
    bit-agreement > 0.999 + pose parity."""
    from rpe_tpu.ops.atlas import BAND, CAP
    from rpe_tpu.ops.extract_pallas import extract_windows_t_brief

    rng = np.random.default_rng(77 + nbody)
    nb, wp, patch = 13, 256, 31
    ha = nb * BAND
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch + 1, (nb, CAP)).astype(np.int32)
    tbl_x0[0, 0] = wp - patch          # right-edge slice must stay exact
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)
    parked = rng.uniform(size=(nb, CAP)) < 0.5
    parked[0, 0] = False               # keep the edge-slice slot live
    rel_y = np.where(parked, -31, rel_y).astype(np.int32)
    tbl_x0 = np.where(parked, 0, tbl_x0).astype(np.int32)
    args = (jnp.asarray(atlas), jnp.asarray(blurred),
            jnp.asarray(tbl_x0), jnp.asarray(rel_y))

    base = extract_windows_t_brief(*args, interpret=True, nbody=nbody,
                                   quant=quant)
    out = extract_windows_t_brief(*args, interpret=True, nbody=nbody,
                                  quant=quant, quad=True)
    agree = float(np.mean(np.asarray(base[0]) == np.asarray(out[0])))
    assert agree >= 0.999, f"bit agreement {agree}"
    for a, b in zip(base[1:], out[1:]):      # m10, m01
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2.0)
    assert not np.asarray(out[0]).reshape(nb * CAP, 256)[
        parked.reshape(-1)].any()


@pytest.mark.parametrize("nbody", [2, 4])
def test_extract_t_nbody_bit_identical(nbody):
    """nbody > 1 (one VMEM transpose serving nbody bands,
    _t_extract_slots v2.1) must be bit-identical to nbody=1 for BOTH
    transposed kernels. nb=15 is deliberately not a multiple of 4 so the
    _pad_tables parked-band path is exercised. Bands whose window blocks
    are clamped at the atlas edge (the last WIN//BAND-1 bands, parked-only
    in production per atlas_layout) are excluded: clamping composes
    differently per nbody there."""
    from rpe_tpu.ops.atlas import BAND, CAP, WIN
    from rpe_tpu.ops.extract_pallas import (extract_windows_t,
                                            extract_windows_t_brief)

    rng = np.random.default_rng(11 + nbody)
    nb, wp, patch = 15, 256, 31
    ha = nb * BAND
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch + 1, (nb, CAP)).astype(np.int32)
    tbl_x0[0, 0] = wp - patch          # right-edge slice must stay exact
    rel_y = rng.integers(0, BAND, (nb, CAP)).astype(np.int32)
    args = (jnp.asarray(atlas), jnp.asarray(blurred),
            jnp.asarray(tbl_x0), jnp.asarray(rel_y))
    ok = nb - (WIN // BAND - 1)        # unclamped band count

    base = extract_windows_t(*args, interpret=True, nbody=1)
    out = extract_windows_t(*args, interpret=True, nbody=nbody)
    for a, b in zip(base, out):
        np.testing.assert_array_equal(np.asarray(a)[:ok],
                                      np.asarray(b)[:ok])
    assert out[0].shape == base[0].shape

    base_b = extract_windows_t_brief(*args, interpret=True, nbody=1)
    out_b = extract_windows_t_brief(*args, interpret=True, nbody=nbody)
    for a, b in zip(base_b, out_b):
        np.testing.assert_array_equal(np.asarray(a)[:ok],
                                      np.asarray(b)[:ok])
    assert out_b[0].shape == base_b[0].shape


def test_extract_t_brief_end_to_end(gray):
    """Full atlas ORB with RPE_EXTRACT_T_BRIEF=1 (descriptors in-kernel) vs
    RPE_EXTRACT_T alone: identical outputs in interpret mode (the v3 kernel
    runs the same op chain as steered_brief_t on the same moments)."""
    import os
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import rpe_tpu.ops.fast as fast_mod
    from rpe_tpu.ops.orb import orb_detect_and_describe_atlas

    img = jnp.asarray(gray[:160, :192])
    with mock.patch.object(fast_mod, "_use_pallas", lambda: True), \
         mock.patch.dict(os.environ, {"RPE_PALLAS_EXTRACT": "1",
                                      "RPE_EXTRACT_T": "1",
                                      "RPE_NO_PALLAS": ""}), \
         pltpu.force_tpu_interpret_mode():
        ref = orb_detect_and_describe_atlas(img, nfeatures=500, nlevels=4,
                                            max_kpts=512)

    with mock.patch.object(fast_mod, "_use_pallas", lambda: True), \
         mock.patch.dict(os.environ, {"RPE_PALLAS_EXTRACT": "1",
                                      "RPE_EXTRACT_T": "1",
                                      "RPE_EXTRACT_T_BRIEF": "1",
                                      "RPE_NO_PALLAS": ""}), \
         pltpu.force_tpu_interpret_mode():
        got = orb_detect_and_describe_atlas(img, nfeatures=500, nlevels=4,
                                            max_kpts=512)

    vr = np.asarray(ref["valid"])
    np.testing.assert_array_equal(vr, np.asarray(got["valid"]))
    assert vr.sum() > 100
    np.testing.assert_array_equal(np.asarray(ref["bits"])[vr],
                                  np.asarray(got["bits"])[vr])
    np.testing.assert_array_equal(np.asarray(ref["angle"])[vr],
                                  np.asarray(got["angle"])[vr])


@pytest.mark.parametrize("cap", [16, 32])
def test_extract_t_brief_kernel_cap_parameterized(cap):
    """Extraction kernels must honor a non-default slots-per-band `cap`
    (OrbConfig.extract_cap -> atlas.banded_extract(cap=...)): the v3
    T_BRIEF kernel at cap 16/32 must stay bit-identical to
    extract_windows_t + orb.steered_brief_t on the same (NB, cap)
    tables. Guards the round-4 cap parameterization (kernels derive cap
    from the table block shape, not the atlas.CAP module constant)."""
    from rpe_tpu.ops.atlas import BAND
    from rpe_tpu.ops.extract_pallas import (extract_windows_t,
                                            extract_windows_t_brief)
    from rpe_tpu.ops.orb import steered_brief_t

    rng = np.random.default_rng(57 + cap)
    nb, wp, patch = 12, 256, 31
    ha = nb * BAND
    atlas = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    blurred = rng.uniform(0, 255, (ha, wp)).astype(np.float32)
    tbl_x0 = rng.integers(0, wp - patch + 1, (nb, cap)).astype(np.int32)
    tbl_x0[0, 0] = wp - patch          # right-edge slice must stay exact
    rel_y = rng.integers(0, BAND, (nb, cap)).astype(np.int32)
    args = (jnp.asarray(atlas), jnp.asarray(blurred),
            jnp.asarray(tbl_x0), jnp.asarray(rel_y))

    blur_t, m10, m01 = extract_windows_t(*args, interpret=True, nbody=4)
    angles = jnp.arctan2(m01.reshape(-1), m10.reshape(-1))
    ref_bits = np.asarray(steered_brief_t(
        blur_t[:, :, :patch, :patch].reshape(nb * cap, patch, patch),
        angles)).reshape(nb, cap, 256)

    bits, m10b, m01b = extract_windows_t_brief(*args, interpret=True,
                                               nbody=4)
    np.testing.assert_array_equal(np.asarray(m10b), np.asarray(m10))
    np.testing.assert_array_equal(np.asarray(m01b), np.asarray(m01))
    np.testing.assert_array_equal(np.asarray(bits), ref_bits)


def test_banded_extract_cap_semantics(gray):
    """cap plumbing through orb_detect_and_describe_atlas: cap=None equals
    the CAP=24 default bit-for-bit; raising cap only ADDS keypoints (the
    per-band drop rule keeps the first `cap` slots, so cap-24 survivors
    are a per-band prefix of cap-32 survivors)."""
    from rpe_tpu.ops.orb import orb_detect_and_describe_atlas

    img = jnp.asarray(gray)
    d0 = orb_detect_and_describe_atlas(img, nfeatures=1500, nlevels=6,
                                       max_kpts=1536)
    d24 = orb_detect_and_describe_atlas(img, nfeatures=1500, nlevels=6,
                                        max_kpts=1536, extract_cap=24)
    for k in d0:
        np.testing.assert_array_equal(np.asarray(d0[k]), np.asarray(d24[k]))

    d32 = orb_detect_and_describe_atlas(img, nfeatures=1500, nlevels=6,
                                        max_kpts=1536, extract_cap=32)
    v24 = np.asarray(d24["valid"])
    v32 = np.asarray(d32["valid"])
    assert v32.sum() >= v24.sum()
    s24 = {tuple(p) for p in np.asarray(d24["xy"])[v24].round(3).tolist()}
    s32 = {tuple(p) for p in np.asarray(d32["xy"])[v32].round(3).tolist()}
    assert s24 <= s32
