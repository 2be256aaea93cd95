"""Pooled banding (OrbConfig.band = 8/16/32, round-5 extraction lever).

Wider bands pool slot capacity over several 8-row bands: clustered rows
borrow slots from sparse neighbors, so the same keypoint drop rate needs
fewer total slots (the measured extraction cost dial — ~260 ns/slot with
per-slot work invariant, docs/PERF_LOG.md v4/v5/v6 rejections).
"""
import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _real_pair():
    img1 = cv2.imread(
        "/root/reference/evaluation-runs/single-pair/images/000000.png",
        cv2.IMREAD_GRAYSCALE)
    img2 = cv2.imread(
        "/root/reference/evaluation-runs/single-pair/images/000015.png",
        cv2.IMREAD_GRAYSCALE)
    a = cv2.resize(img1, (320, 128), interpolation=cv2.INTER_AREA)
    b = cv2.resize(img2, (320, 128), interpolation=cv2.INTER_AREA)
    return a.astype(np.float32), b.astype(np.float32)


def _detect(img, band, cap=None):
    from rpe_tpu.ops.orb import orb_detect_and_describe

    d = orb_detect_and_describe(jnp.asarray(img), nfeatures=512, nlevels=3,
                                max_kpts=512, band=band, extract_cap=cap)
    return {k: np.asarray(v) for k, v in d.items()}


@pytest.mark.parametrize("band", [16, 32])
def test_band_keypoint_retention_and_descriptor_equality(band):
    """At the scaled default cap (24 * band/8), pooling reduces TOTAL
    drops (more keypoints survive), though slot assignment is order-based
    so a handful of *individuals* can differ; descriptors of the common
    keypoints are bit-identical (same patch values selected through
    band-generic windows)."""
    a, _ = _real_pair()
    d8 = _detect(a, 8)
    dB = _detect(a, band)
    m8, mB = d8["valid"], dB["valid"]
    assert mB.sum() >= m8.sum()
    def keys(d, m):
        # (xy, level, score) — xy alone collides across levels (distinct
        # keypoints land on the same rounded level-0 coordinate)
        return {(tuple(np.round(d["xy"][i], 3)), int(d["level"][i]),
                 float(d["score"][i])): i
                for i in range(len(m)) if m[i]}

    key8 = keys(d8, m8)
    keyB = keys(dB, mB)
    missing = set(key8) - set(keyB)
    # order-based slot contention may swap a few individuals, never many
    assert len(missing) <= 0.02 * len(key8) + 2, \
        f"band={band} lost {len(missing)}/{len(key8)} kpts"
    common = set(key8) & set(keyB)
    assert len(common) >= 0.95 * len(key8)
    for k in common:
        i8, iB = key8[k], keyB[k]
        np.testing.assert_array_equal(d8["bits"][i8], dB["bits"][iB])
        np.testing.assert_allclose(d8["angle"][i8], dB["angle"][iB],
                                   rtol=0, atol=0)


def test_band32_pallas_interpret_bit_parity():
    """The band-parameterized T_BRIEF kernel (interpret mode) at band=32
    must agree with the XLA banded path exactly as it does at band=8."""
    import os

    from rpe_tpu.ops.orb import orb_detect_and_describe

    a, _ = _real_pair()
    kw = dict(nfeatures=512, nlevels=3, max_kpts=512, band=32)
    det_x = _detect(a, 32)
    os.environ["RPE_PALLAS_INTERPRET"] = "1"
    os.environ["RPE_EXTRACT_T"] = "1"
    os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
    try:
        det_p = jax.jit(
            lambda im: orb_detect_and_describe(im, **kw))(jnp.asarray(a))
        det_p = {k: np.asarray(v) for k, v in det_p.items()}
    finally:
        for k in ("RPE_PALLAS_INTERPRET", "RPE_EXTRACT_T",
                  "RPE_EXTRACT_T_BRIEF"):
            os.environ[k] = "0"
    m = det_x["valid"]
    assert (det_p["valid"] == m).all()
    assert np.array_equal(det_p["xy"][m], det_x["xy"][m])
    ba = float((det_p["bits"][m] == det_x["bits"][m]).mean())
    # family gate, not ==1.0: the in-kernel IC-moment reduction orders
    # differ from the XLA path's ic_angles (32x32 padded vs 31x31 sums),
    # and a ULP angle difference flips a BRIEF sample on a round()
    # boundary — same reason the T_BRIEF hardware gate is > 0.999
    # (measured here: 1 bit in ~76k at band=32)
    assert ba > 0.999, f"bit agreement {ba}"


def test_band32_pose_equivalence():
    """End-to-end pose at band=32/cap96 matches band=8/cap24 within
    behavioral tolerance (keypoint sets differ only by rescued drops)."""
    import dataclasses

    from rpe_tpu.config import EstimatorConfig, MatcherConfig, OrbConfig
    from rpe_tpu.pipeline.estimator import estimate_pair

    a, b = _real_pair()
    K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300.0, 64], [0, 0, 1]],
                             np.float32))
    def runs(band):
        cfg = EstimatorConfig(
            orb=OrbConfig(nfeatures=512, nlevels=3, max_kpts=512,
                          band=band),
            matcher=MatcherConfig(max_matches=128))
        out = []
        for seed in range(4):
            o = estimate_pair(jnp.asarray(a), jnp.asarray(b), K,
                              jax.random.PRNGKey(seed), cfg=cfg)
            assert bool(o["valid"])
            out.append(np.asarray(o["R"], np.float64))
        return out

    def ang(Ra, Rb):
        c = (np.trace(Ra.T @ Rb) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    r8, r32 = runs(8), runs(32)
    # this starved test config (512 feats on a 320x128 crop) has ~1-2
    # deg intrinsic RANSAC seed noise (measured band32 seed spread
    # 1.98 deg), so per-seed equality is meaningless — the median
    # same-seed cross-band delta must sit inside that noise floor
    cross = sorted(ang(r8[i], r32[i]) for i in range(4))
    med = cross[len(cross) // 2]
    assert med < 1.5, f"median pose delta {med} deg (all {cross})"


def test_band32_quad_interpret_bit_parity():
    """The PRODUCTION extraction config (round-5 adoption: band=32,
    cap=72... smoke-sized here, quad kernel) must agree with the XLA
    banded path exactly as the band-8 families do. Guards the
    _VALIDATED_KERNEL_GATES default for RPE_EXTRACT_T_QUAD at band=32
    (hardware twin: validate_kernels_tpu.py T_QUAD_B32)."""
    import os

    from rpe_tpu.ops.orb import orb_detect_and_describe

    a, _ = _real_pair()
    kw = dict(nfeatures=512, nlevels=3, max_kpts=512, band=32,
              extract_cap=24)
    det_x = _detect(a, 32, cap=24)
    os.environ["RPE_PALLAS_INTERPRET"] = "1"
    os.environ["RPE_EXTRACT_T"] = "1"
    os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
    os.environ["RPE_EXTRACT_T_QUAD"] = "1"
    try:
        det_p = jax.jit(
            lambda im: orb_detect_and_describe(im, **kw))(jnp.asarray(a))
        det_p = {k: np.asarray(v) for k, v in det_p.items()}
    finally:
        for k in ("RPE_PALLAS_INTERPRET", "RPE_EXTRACT_T",
                  "RPE_EXTRACT_T_BRIEF", "RPE_EXTRACT_T_QUAD"):
            os.environ[k] = "0"
    m = det_x["valid"]
    assert (det_p["valid"] == m).all()
    assert np.array_equal(det_p["xy"][m], det_x["xy"][m])
    ba = float((det_p["bits"][m] == det_x["bits"][m]).mean())
    # same family gate as the other interpret parity tests (reassociated
    # IC moments can flip a BRIEF sample on a round() boundary; hardware
    # measured 1.00000 for the quad family 08-20)
    assert ba > 0.999, f"bit agreement {ba}"


def test_production_profile_defaults():
    """The parity profile rides the adopted pooled-banding config; the
    small work-cut profiles keep their measured band-8 shapes (their
    caps are sized in per-8-row units, docs/API.md 'Profiles')."""
    from rpe_tpu.config import profile_config

    par = profile_config("parity")
    assert par.orb.band == 32 and par.orb.extract_cap == 72
    assert profile_config("orb2000").orb.band == 32
    for name in ("orb1000", "orb512"):
        p = profile_config(name)
        assert p.orb.band == 8, name
        assert p.orb.extract_cap in (16, 12), name


def test_v7_binned_kernel_matches_xla_twin():
    """The v7 binned-steering experiment (REJECTED for speed, kept as a
    documented kernel): bits must equal orb.steered_brief_t_binned on the
    same tables — the twin that defines the ORB-paper 30-bin semantics
    (orb.brief_bin_tables)."""
    from rpe_tpu.ops.extract_pallas import (extract_windows_t,
                                            extract_windows_t_brief)
    from rpe_tpu.ops.orb import steered_brief_t_binned

    rng = np.random.default_rng(5)
    band, cap, nbody, nb = 32, 24, 1, 4
    ha, wp = nb * band, 384
    atlas = jnp.asarray(rng.uniform(0, 255, (ha, wp)).astype(np.float32))
    blurred = jnp.asarray(rng.uniform(0, 255, (ha, wp)).astype(np.float32))
    x0 = jnp.asarray(rng.integers(0, wp - 31, (nb, cap)).astype(np.int32))
    rely = np.full((nb, cap), -31, np.int32)
    live = rng.random((nb, cap)) < 0.5
    rely[live] = rng.integers(0, band, live.sum())
    rely = jnp.asarray(rely)
    bits7, m10, m01 = extract_windows_t_brief(
        atlas, blurred, x0, rely, interpret=True, band=band, nbody=nbody,
        binned=True)
    blurp_t, _, _ = extract_windows_t(
        atlas, blurred, x0, rely, interpret=True, band=band, nbody=nbody)
    bt = jnp.asarray(np.asarray(blurp_t).reshape(-1, 32, 32))
    ref = np.asarray(steered_brief_t_binned(
        bt, jnp.asarray(m10).reshape(-1), jnp.asarray(m01).reshape(-1)))
    got = np.asarray(bits7).reshape(-1, 256)
    assert (got == ref).mean() > 0.999
    assert not got[~live.reshape(-1)].any()
