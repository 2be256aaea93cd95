"""2-D mesh (pairs x hyp) sharded estimation + multihost helpers +
observability utilities on the fake 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scipy.ndimage import gaussian_filter

from rpe_tpu.config import EstimatorConfig, OrbConfig, MatcherConfig, RansacConfig
from rpe_tpu.parallel.sharded_estimator import estimate_pairs_2d
from rpe_tpu.utils import StageTimer, ThroughputMeter

TINY = EstimatorConfig(
    orb=OrbConfig(nfeatures=256, nlevels=2, max_kpts=256),
    matcher=MatcherConfig(max_matches=64),
    ransac=RansacConfig(num_hypotheses=256),
)


def _blocky(rng, h=96, w=128, cell=8):
    """Corner-rich synthetic texture (random blocks -> FAST corners at every
    block intersection; smooth noise has no 15-step FAST transitions)."""
    t = rng.uniform(0, 255, (h // cell, w // cell)).astype(np.float32)
    return t.repeat(cell, 0).repeat(cell, 1)


def test_estimate_pairs_2d_mesh(rng):
    from tests.test_sharding import _parallax_pair

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("pairs", "hyp"))
    B = 8
    pairs = [_parallax_pair(rng) for _ in range(B)]
    imgs1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    imgs2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    K = jnp.asarray(np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]],
                             np.float32))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    s = NamedSharding(mesh, P("pairs"))
    imgs1, imgs2, keys = (jax.device_put(x, s) for x in (imgs1, imgs2, keys))

    out = estimate_pairs_2d(imgs1, imgs2, K, keys, TINY, mesh)
    R = np.asarray(out["R"])
    assert R.shape == (B, 3, 3)
    v = np.asarray(out["valid"])
    assert v.sum() >= B - 2  # synthetic texture; most pairs must resolve
    # pure x-shift: rotations near identity for valid pairs
    tr = np.clip((np.trace(R[v], axis1=1, axis2=2) - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(tr))
    assert np.median(ang) < 10.0


def test_estimate_pairs_2d_5pt_matches_single_device(rng):
    """The production solver (5pt Nister, the pipeline default) under the
    2-D (pairs x hyp) mesh: the all_gather winner must land on the same pose
    as the unsharded single-device estimator (each hyp shard evaluates a
    different PRNG stream, so agreement is geometric, not bitwise)."""
    from tests.test_sharding import _parallax_pair
    from rpe_tpu.pipeline.estimator import estimate_pair

    assert TINY.ransac.solver == "5pt"  # guard: this must be the default
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("pairs", "hyp"))
    B = 2
    pairs = [_parallax_pair(rng) for _ in range(B)]
    imgs1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    imgs2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    K = jnp.asarray(np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]],
                             np.float32))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    s = NamedSharding(mesh, P("pairs"))
    di1, di2, dk = (jax.device_put(x, s) for x in (imgs1, imgs2, keys))

    out = estimate_pairs_2d(di1, di2, K, dk, TINY, mesh)
    from rpe_tpu.geometry import rotation_error

    for b in range(B):
        ref = estimate_pair(imgs1[b], imgs2[b], K, keys[b], cfg=TINY)
        assert bool(np.asarray(out["valid"])[b]) == bool(ref["valid"])
        if not bool(ref["valid"]):
            continue
        d = float(rotation_error(jnp.asarray(np.asarray(out["R"])[b]),
                                 ref["R"]))
        assert d < 1.0, f"pair {b}: sharded-vs-single rotation delta {d}"
        tdot = abs(float(np.dot(np.asarray(out["t"])[b],
                                np.asarray(ref["t"]))))
        assert tdot > 0.95, f"pair {b}: translation agreement {tdot}"


def test_multihost_noop_without_config(monkeypatch):
    from rpe_tpu.parallel.multihost import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_stage_timer_and_throughput():
    t = StageTimer()
    with t.stage("demo", sync_on=jnp.ones((4,))):
        _ = jnp.sum(jnp.ones((8, 8)))
    rep = t.report()
    assert "demo" in rep and rep["demo"]["count"] == 1

    m = ThroughputMeter(n_chips=2)
    m.start()
    m.stop(pairs=20, sync_on=jnp.ones((2,)))
    assert m.pairs_per_sec_per_chip() > 0


def test_debug_audit_checks(capfd, monkeypatch):
    """RPE_DEBUG_CHECKS inserts jax.debug audit counters into the compiled
    path without changing results (SURVEY §5 sanitizer row)."""
    import jax
    import jax.numpy as jnp
    from rpe_tpu.config import EstimatorConfig, OrbConfig, MatcherConfig, \
        RansacConfig
    from rpe_tpu.pipeline.estimator import estimate_pair

    cfg = EstimatorConfig(
        orb=OrbConfig(nfeatures=128, nlevels=2, max_kpts=128),
        matcher=MatcherConfig(max_matches=64),
        ransac=RansacConfig(num_hypotheses=64, solver="8pt"),
    )
    rng2 = np.random.default_rng(1)
    img = jnp.asarray(
        rng2.uniform(0, 255, (12, 16)).astype(np.float32
                                              ).repeat(8, 0).repeat(8, 1))
    K = jnp.asarray(np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]],
                             np.float32))
    base = estimate_pair(img, img, K, jax.random.PRNGKey(0), cfg=cfg)

    monkeypatch.setenv("RPE_DEBUG_CHECKS", "1")
    jax.clear_caches()  # the flag is a trace-time constant
    audited = estimate_pair(img, img, K, jax.random.PRNGKey(0), cfg=cfg)
    jax.block_until_ready(audited)
    out = capfd.readouterr().out
    assert "[AUDIT] detect/xy1" in out
    assert "[AUDIT] recover_pose" in out
    np.testing.assert_array_equal(np.asarray(base["R"]),
                                  np.asarray(audited["R"]))
    monkeypatch.delenv("RPE_DEBUG_CHECKS")
    jax.clear_caches()
