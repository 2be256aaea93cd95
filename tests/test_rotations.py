"""Rotation utilities vs numpy/OpenCV oracles.

Oracle strategy per SURVEY.md §4: every kernel is unit-tested against an
independent implementation (cv2.Rodrigues for the exp map; hand-rolled numpy
matrices for Euler conventions matching reference src/utils/geometry.py).
"""

import cv2
import numpy as np
import jax.numpy as jnp

from rpe_tpu.geometry import (
    euler_to_rotation_yup,
    euler_to_rotation_zyx,
    rotation_to_euler_yup,
    rotation_to_euler_zyx,
    rotation_error,
    translation_direction_error,
    wrap_angle_error,
    so3_exp,
    so3_log,
)


def _np_yup(yaw_deg, pitch_deg, roll_deg):
    y, p, r = np.deg2rad([yaw_deg, pitch_deg, roll_deg])
    Ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(p), -np.sin(p)], [0, np.sin(p), np.cos(p)]])
    Rz = np.array([[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0], [0, 0, 1]])
    return Ry @ Rx @ Rz


def _np_zyx(yaw_deg, pitch_deg, roll_deg):
    y, p, r = np.deg2rad([yaw_deg, pitch_deg, roll_deg])
    Rz = np.array([[np.cos(y), -np.sin(y), 0], [np.sin(y), np.cos(y), 0], [0, 0, 1]])
    Ry = np.array([[np.cos(p), 0, np.sin(p)], [0, 1, 0], [-np.sin(p), 0, np.cos(p)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)], [0, np.sin(r), np.cos(r)]])
    return Rz @ Ry @ Rx


def test_euler_to_rotation_matches_numpy_oracle(rng):
    for _ in range(50):
        y, p, r = rng.uniform(-179, 179), rng.uniform(-85, 85), rng.uniform(-179, 179)
        np.testing.assert_allclose(
            np.asarray(euler_to_rotation_yup(y, p, r)), _np_yup(y, p, r), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(euler_to_rotation_zyx(y, p, r)), _np_zyx(y, p, r), atol=1e-5
        )


def _load_reference_geometry():
    """Import the reference's pure-numpy geometry module as a test oracle.

    NOTE: the reference's yup *decomposition* is deliberately NOT the inverse
    of its composition (rotation_to_euler_yup(euler_to_rotation_yup(y,p,r))
    != (y,p,r) for large roll/pitch) — this quirk is part of the observable
    behavior baked into the committed golden CSVs, so our implementation must
    reproduce the exact formulas, not mathematical invertibility.
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_geometry", "/root/reference/src/utils/geometry.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotation_to_euler_yup_matches_reference_oracle(rng):
    ref = _load_reference_geometry()
    for _ in range(100):
        y, p, r = rng.uniform(-179, 179), rng.uniform(-85, 85), rng.uniform(-179, 179)
        R = np.asarray(euler_to_rotation_yup(y, p, r), dtype=np.float64)
        ours = [float(v) for v in rotation_to_euler_yup(R)]
        theirs = [float(v) for v in ref.rotation_to_euler_yup(R)]
        np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_rotation_to_euler_zyx_matches_reference_oracle(rng):
    ref = _load_reference_geometry()
    for _ in range(100):
        y, p, r = rng.uniform(-179, 179), rng.uniform(-85, 85), rng.uniform(-179, 179)
        R = np.asarray(euler_to_rotation_zyx(y, p, r), dtype=np.float64)
        ours = [float(v) for v in rotation_to_euler_zyx(R)]
        theirs = [float(v) for v in ref.rotation_to_euler_zyx(R)]
        np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_euler_roundtrip_zyx(rng):
    for _ in range(100):
        y, p, r = rng.uniform(-179, 179), rng.uniform(-85, 85), rng.uniform(-179, 179)
        R = euler_to_rotation_zyx(y, p, r)
        y2, p2, r2 = rotation_to_euler_zyx(R)
        np.testing.assert_allclose([float(y2), float(p2), float(r2)], [y, p, r], atol=1e-3)


def test_euler_batched():
    ys = jnp.array([10.0, -20.0, 30.0])
    ps = jnp.array([5.0, 15.0, -25.0])
    rs = jnp.array([0.0, 45.0, -60.0])
    R = euler_to_rotation_yup(ys, ps, rs)
    assert R.shape == (3, 3, 3)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(R[i]), _np_yup(float(ys[i]), float(ps[i]), float(rs[i])), atol=1e-5
        )


def test_so3_exp_matches_rodrigues(rng):
    for _ in range(50):
        w = rng.normal(size=3) * rng.uniform(0, np.pi)
        R_cv, _ = cv2.Rodrigues(w.reshape(3, 1))
        np.testing.assert_allclose(np.asarray(so3_exp(w)), R_cv, atol=1e-5)
    # tiny angle
    w = np.array([1e-9, -2e-9, 1e-10])
    R_cv, _ = cv2.Rodrigues(w.reshape(3, 1))
    np.testing.assert_allclose(np.asarray(so3_exp(w)), R_cv, atol=1e-6)


def test_so3_log_roundtrip(rng):
    for _ in range(50):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * rng.uniform(0.01, 3.0)
        w2 = np.asarray(so3_log(so3_exp(w)))
        np.testing.assert_allclose(w2, w, atol=1e-4)


def test_rotation_error_zero_and_known():
    R = euler_to_rotation_yup(30.0, 10.0, -5.0)
    assert float(rotation_error(R, R)) < 1e-3
    Ra = euler_to_rotation_yup(0.0, 0.0, 0.0)
    Rb = euler_to_rotation_yup(25.0, 0.0, 0.0)
    np.testing.assert_allclose(float(rotation_error(Ra, Rb)), 25.0, atol=1e-3)


def test_translation_direction_error():
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(float(translation_direction_error(a, b)), 90.0, atol=1e-4)
    c = jnp.array([5.0, 0.0, 0.0])
    np.testing.assert_allclose(float(translation_direction_error(a, c)), 0.0, atol=1e-3)
    # column-vector inputs (reference passes (3,1) t's)
    np.testing.assert_allclose(
        float(translation_direction_error(a.reshape(3, 1), b.reshape(3, 1))), 90.0, atol=1e-4
    )


def test_wrap_angle_error():
    np.testing.assert_allclose(float(wrap_angle_error(350.0)), 10.0, atol=1e-6)
    np.testing.assert_allclose(float(wrap_angle_error(180.0)), 180.0, atol=1e-6)
    np.testing.assert_allclose(float(wrap_angle_error(10.0)), 10.0, atol=1e-6)
