"""2-D-mesh sharded estimation: pair-DP x hypothesis-parallel RANSAC.

The workload's natural axis is pair-level data parallelism (SURVEY.md §2.3).
For single huge pairs — or to use more chips than there are pairs — the
RANSAC hypothesis batch is the second shardable axis: each device along
'hyp' evaluates num_hypotheses / n_hyp minimal samples (with a fold_in'd
PRNG stream), and the winning model is selected with an all_gather +
argmax over ICI. Detection/matching are replicated along 'hyp' (they are
cheap relative to hypothesis scoring at large hypothesis counts; the
all_gather moves 9 floats + 1 int per device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import EstimatorConfig
from ..geometry.epipolar import normalize_points, sampson_error_sq
from ..geometry.ransac import ransac_essential
from ..geometry.recover_pose import recover_pose
from ..pipeline.estimator import detect_features, match_features


def _estimate_pair_hyp_sharded(img1, img2, K, key, cfg: EstimatorConfig,
                               axis: str = "hyp"):
    """Single-pair estimate with the hypothesis axis sharded over `axis`.

    Must run inside shard_map with a mesh axis named `axis`.
    """
    det1 = detect_features(img1, cfg)
    det2 = detect_features(img2, cfg)
    matches = match_features(det1, det2, cfg)
    pts1 = jnp.take(det1["xy"], matches["idx1"], axis=0)
    pts2 = jnp.take(det2["xy"], matches["idx2"], axis=0)
    mvalid = matches["valid"]
    num_matches = jnp.sum(mvalid.astype(jnp.int32))

    with jax.default_matmul_precision("highest"):
        n1 = normalize_points(pts1, K)
        n2 = normalize_points(pts2, K)
        thr_n = cfg.ransac.threshold_px / (0.5 * (K[0, 0] + K[1, 1]))

        n_dev = jax.lax.axis_size(axis)
        local_h = max(cfg.ransac.num_hypotheses // n_dev, 8)
        local_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        r = ransac_essential(
            local_key, n1, n2, mvalid, thr_n,
            num_hypotheses=local_h,
            refit_rounds=cfg.ransac.refit_rounds,
            solver=cfg.ransac.solver,
            degensac=cfg.ransac.degensac,
        )
        # winner across the hypothesis shards, selected over ICI
        counts = jax.lax.all_gather(r["num_inliers"], axis)      # (n_dev,)
        Es = jax.lax.all_gather(r["E"], axis)                    # (n_dev,3,3)
        best = jnp.argmax(counts)
        E = Es[best]
        # recompute the winner's inlier stats locally (deterministic)
        d2 = sampson_error_sq(E, n1, n2)
        inlier_mask = (d2 < thr_n * thr_n) & mvalid
        num_inliers = jnp.sum(inlier_mask.astype(jnp.int32))
        # solver-aware gate, matching ransac_essential's (the reference
        # succeeds with 5 matches on the 5pt path, pose_estimator.py:514)
        min_valid = 5 if cfg.ransac.solver == "5pt" else 8
        ok = (num_matches >= min_valid) & (num_inliers >= 5)

        R, t, votes, _ = recover_pose(E, n1, n2, mvalid,
                                      inlier_mask=inlier_mask)

    valid = ok & (num_matches >= 5)
    eye = jnp.eye(3, dtype=R.dtype)
    t001 = jnp.array([0.0, 0.0, 1.0], dtype=t.dtype)
    # static-pair identity short-circuit, same contract as
    # pipeline/estimator._match_to_pose (PARITY.md "zero-motion pairs")
    if cfg.ransac.zero_motion_px > 0.0:
        from ..pipeline.estimator import zero_motion_gate

        zm = zero_motion_gate(pts1, pts2, mvalid, num_matches,
                              cfg.ransac.zero_motion_px)
        valid = valid | zm
    else:
        zm = jnp.zeros((), bool)
    R = jnp.where(valid & ~zm, R, eye)
    t = jnp.where(valid & ~zm, t, t001)
    return {
        "R": R, "t": t, "valid": valid,
        "num_matches": num_matches, "num_inliers": num_inliers,
        "cheirality_votes": votes,
    }


def estimate_sequence_sharded(frame_blocks, K, key_blocks,
                              cfg: EstimatorConfig, mesh):
    """Sequence-batched estimation sharded over a 1-D 'pairs' mesh axis.

    frame_blocks: (n_dev, local+1, H, W) — device d holds the local+1
      consecutive frames covering its `local` contiguous pairs (one
      overlapping boundary frame per device). Each device detects each of
      its local frames ONCE and shares detections between adjacent pairs
      (pipeline/estimator.estimate_sequence_batched) — ~(B + n_dev) total
      detections per chunk instead of the 2B the replicated-frames mesh
      path cost (detection is ~2/3 of the pair budget, docs/PERF_LOG.md).
    key_blocks: (n_dev, local, 2) uint32 PRNG keys, one per pair.

    Returns the estimate_sequence_batched output dict with a leading
    (n_dev, local, ...) shape; reshape to (n_dev*local, ...) for the flat
    pair axis. Blocks are self-contained: no collectives cross devices.
    """
    from ..pipeline.estimator import estimate_sequence_batched

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("pairs"), P(), P("pairs")),
        out_specs=P("pairs"),
        check_vma=False,
    )
    def step(fblk, Kf, kblk):
        out = estimate_sequence_batched(fblk[0], Kf, kblk[0], cfg=cfg)
        return jax.tree.map(lambda x: x[None], out)

    return step(frame_blocks, K, key_blocks)


def estimate_pairs_2d(imgs1, imgs2, K, keys, cfg: EstimatorConfig, mesh):
    """Batched pair estimation over a 2-D ('pairs', 'hyp') mesh.

    imgs1/imgs2: (B, H, W) with B divisible by the 'pairs' axis size;
    every 'hyp' device holds a replica of its pairs shard and evaluates a
    slice of the hypothesis batch.
    """
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P(), P("pairs")),
        out_specs=P("pairs"),
        check_vma=False,
    )
    def step(i1, i2, Kf, ks):
        return jax.vmap(
            lambda a, b, k: _estimate_pair_hyp_sharded(a, b, Kf, k, cfg)
        )(i1, i2, ks)

    return step(imgs1, imgs2, K, keys)
