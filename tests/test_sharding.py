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


def test_sequence_blocks_cover_chunk_with_one_overlap_frame():
    """Per-device blocks are consecutive, cover every pair, and stage only
    chunk + n_dev frame slots (not 2*chunk) — the sequence-sharing layout
    (pipeline/batch._sequence_blocks)."""
    from rpe_tpu.pipeline.batch import _sequence_blocks

    n_dev, local = 4, 3
    chunk = n_dev * local
    sel1 = list(range(10, 10 + chunk))  # no padding
    blocks = _sequence_blocks(sel1, local, n_dev, last_frame_pos=1000)
    assert blocks.shape == (n_dev, local + 1)
    # consecutive within each device
    assert (np.diff(blocks, axis=1) == 1).all()
    # every pair (f, f+1) appears on exactly one device
    covered = {(int(blocks[d, j]), int(blocks[d, j + 1]))
               for d in range(n_dev) for j in range(local)}
    assert covered == {(f, f + 1) for f in sel1}
    # frame-slot accounting: chunk + n_dev slots vs 2*chunk duplicated
    assert blocks.size == chunk + n_dev < 2 * chunk


def test_sequence_blocks_padded_chunk_keeps_real_pairs_at_flat_slots():
    """POSITIONAL contract on padded chunks: real pair p must sit at flat
    slot p computing (sel1[p], sel1[p]+1). The original element-wise copy
    of sel1 put pad repeats inside the boundary device's block, shifting
    the last real pair onto a same-frame degenerate slot (found in the
    round-3 self-review; consumer slices out[:n] by flat position,
    pipeline/batch.py)."""
    from rpe_tpu.pipeline.batch import _sequence_blocks

    def flat_pairs(blocks, n_dev, local):
        return [(int(blocks[d, j]), int(blocks[d, j + 1]))
                for d in range(n_dev) for j in range(local)]

    # the reviewer scenario: 101 pairs, chunk 32, 8 devices -> last chunk
    # has 5 real pairs and the boundary device (d=1) is mixed real/pad
    n_dev, local, n_pairs = 8, 4, 101
    chunk = n_dev * local
    idx = list(range(96, 101))
    sel1 = idx + [idx[-1]] * (chunk - len(idx))
    blocks = _sequence_blocks(sel1, local, n_dev, last_frame_pos=n_pairs)
    pairs = flat_pairs(blocks, n_dev, local)
    for p, want in enumerate(idx):
        assert pairs[p] == (want, want + 1), (p, pairs[p])
    # pad slots never index past the final frame position
    assert blocks.max() <= n_pairs
    # exhaustive sweep over real-pair counts and boundary alignments
    for n_real in range(1, chunk + 1):
        start = n_pairs - n_real
        idx = list(range(start, n_pairs))
        sel1 = idx + [idx[-1]] * (chunk - n_real)
        blocks = _sequence_blocks(sel1, local, n_dev,
                                  last_frame_pos=n_pairs)
        pairs = flat_pairs(blocks, n_dev, local)
        assert blocks.max() <= n_pairs
        for p, want in enumerate(idx):
            assert pairs[p] == (want, want + 1), (n_real, p, pairs[p])


def test_sequence_sharded_matches_unsharded(rng):
    """estimate_sequence_sharded over the 8-device 'pairs' mesh returns the
    same poses as single-device estimate_sequence_batched — block-local
    detection sharing must not change results."""
    from rpe_tpu.parallel.sharded_estimator import estimate_sequence_sharded
    from rpe_tpu.pipeline.estimator import estimate_sequence_batched

    n_dev, local = 8, 1
    n_frames = n_dev * local + 1
    h, w = 96, 128
    base = _textured_image(rng, h, w)
    frames = []
    for i in range(n_frames):
        f = np.roll(base, 2 * i, axis=1)
        f[: h // 2] = np.roll(base[: h // 2], 5 * i, axis=1)
        frames.append(f)
    imgs = np.stack(frames)
    K = jnp.asarray(np.diag([120.0, 120.0, 1.0]).astype(np.float32))
    K = K.at[0, 2].set(64.0).at[1, 2].set(48.0)
    B = n_frames - 1
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))

    ref = estimate_sequence_batched(jnp.asarray(imgs), K, keys, cfg=TINY_CFG)

    mesh = pairs_mesh()
    blocks = np.stack([np.arange(d * local, d * local + local + 1)
                       for d in range(n_dev)])
    fblk = jnp.asarray(imgs[blocks])
    kblk = jnp.asarray(keys).reshape(n_dev, local, -1)
    out = estimate_sequence_sharded(fblk, K, kblk, TINY_CFG, mesh)
    out = jax.tree.map(lambda x: x.reshape(B, *x.shape[2:]), out)

    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_allclose(np.asarray(out["R"]), np.asarray(ref["R"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["t"]), np.asarray(ref["t"]),
                               atol=1e-4)
