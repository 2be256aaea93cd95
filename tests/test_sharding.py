"""Multi-chip behavior on the fake 8-device CPU mesh (SURVEY.md §4):
pair-level DP sharding of the batched estimator + psum metric reductions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpe_tpu.config import EstimatorConfig, OrbConfig, MatcherConfig, RansacConfig
from rpe_tpu.parallel import (
    pairs_mesh,
    pairs_hyp_mesh,
    shard_pairs,
    sharded_error_stats,
)
from rpe_tpu.pipeline.estimator import estimate_pairs_batched

TINY_CFG = EstimatorConfig(
    orb=OrbConfig(nfeatures=256, nlevels=2, max_kpts=256),
    matcher=MatcherConfig(max_matches=64),
    ransac=RansacConfig(num_hypotheses=128),
)


def _textured_image(rng, h=96, w=128, cell=8):
    # corner-rich blocky texture: FAST needs 15-step transitions, which
    # smooth noise does not provide
    t = rng.uniform(0, 255, (h // cell, w // cell)).astype(np.float32)
    return t.repeat(cell, 0).repeat(cell, 1)


def _parallax_pair(rng, h=96, w=128):
    """Pair with two depth layers (different shifts): a single uniform shift
    is a planar-degenerate scene whose twisted-pair solution also passes
    cheirality — parallax makes the pose unique."""
    img1 = _textured_image(rng, h, w)
    img2 = img1.copy()
    img2[: h // 2] = np.roll(img1[: h // 2], 2, axis=1)
    img2[h // 2:] = np.roll(img1[h // 2:], 5, axis=1)
    return img1, img2


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_batched_estimator_sharded_over_pairs(rng):
    mesh = pairs_mesh()
    B = 8
    pairs = [_parallax_pair(rng) for _ in range(B)]
    imgs1 = np.stack([p[0] for p in pairs])
    imgs2 = np.stack([p[1] for p in pairs])
    K = jnp.asarray(np.diag([120.0, 120.0, 1.0]).astype(np.float32))
    K = K.at[0, 2].set(64.0).at[1, 2].set(48.0)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))

    i1, i2, k = shard_pairs(mesh, jnp.asarray(imgs1), jnp.asarray(imgs2), keys)
    out = estimate_pairs_batched(i1, i2, K, k, cfg=TINY_CFG)
    assert out["R"].shape == (B, 3, 3)
    # output sharding preserved over the pairs axis
    R_sharding = out["R"].sharding
    assert len(R_sharding.device_set) == 8
    # pure-translation shift: rotation should be small where valid
    R = np.asarray(out["R"])
    valid = np.asarray(out["valid"])
    if valid.any():
        tr = np.clip((np.trace(R[valid], axis1=1, axis2=2) - 1) / 2, -1, 1)
        ang = np.rad2deg(np.arccos(tr))
        assert np.median(ang) < 10.0


def test_sharded_stats_match_numpy(rng):
    mesh = pairs_mesh()
    e = rng.uniform(0, 20, size=64).astype(np.float32)
    v = rng.uniform(size=64) > 0.3
    ej, vj = shard_pairs(mesh, jnp.asarray(e), jnp.asarray(v))
    stats = sharded_error_stats(ej, vj, mesh)
    np.testing.assert_allclose(float(stats["mean"]), e[v].mean(), rtol=1e-5)
    np.testing.assert_allclose(float(stats["max"]), e[v].max(), rtol=1e-6)
    np.testing.assert_allclose(float(stats["min"]), e[v].min(), rtol=1e-6)
    np.testing.assert_allclose(float(stats["std"]), e[v].std(), rtol=1e-4)
    np.testing.assert_allclose(float(stats["count"]), v.sum(), rtol=1e-6)


def test_2d_mesh_constructs():
    mesh = pairs_hyp_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("pairs", "hyp")
