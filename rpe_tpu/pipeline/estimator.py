"""Fused relative-pose estimator: detect -> match -> RANSAC -> recoverPose.

TPU-native re-design of the reference's `PoseEstimator.estimate`
(reference: src/core/pose_estimator.py:487-569). The functional core
`estimate_pair` is a single jit-compiled XLA program with static shapes and
no host round-trips between stages; failures surface as a `valid=False`
flag instead of exceptions so a degenerate pair cannot kill a sharded batch
(SURVEY.md §5, failure-detection row). The `PoseEstimator` class preserves
the reference's exception-raising single-pair API on top.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EstimatorConfig
from ..geometry.epipolar import normalize_points
from ..geometry.ransac import ransac_essential
from ..geometry.recover_pose import recover_pose
from ..ops.match import (
    cross_check_match,
    hamming_distance_matrix,
    l2sq_distance_matrix,
    ratio_test_match,
)
from ..ops.orb import orb_detect_and_describe


def detect_features(img, cfg: EstimatorConfig):
    """Feature detection dispatch (ORB now; SIFT via ops/sift.py)."""
    if cfg.feature_method.upper() == "ORB":
        o = cfg.orb
        return orb_detect_and_describe(
            img,
            nfeatures=o.nfeatures,
            nlevels=o.nlevels,
            scale_factor=o.scale_factor,
            fast_threshold=o.fast_threshold,
            max_kpts=o.max_kpts,
            extract_cap=o.extract_cap,
            band=o.band,
        )
    if cfg.feature_method.upper() == "SIFT":
        from ..ops.sift import sift_detect_and_describe

        return sift_detect_and_describe(img, cfg.sift)
    raise ValueError(f"Unknown feature extraction method: {cfg.feature_method}")


def match_features(det1, det2, cfg: EstimatorConfig):
    """Descriptor matching dispatch: one MXU distance matmul + selection."""
    from ..ops.fast import _use_pallas, kernel_gate

    m = cfg.matcher
    norm = m.norm_type.lower()
    key = "bits" if norm == "hamming" else "desc"
    if (norm in ("hamming", "l2") and _use_pallas()
            and kernel_gate("RPE_PALLAS_MATCH")
            and det1[key].shape[0] % 128 == 0):
        # Fused matmul+reduction kernels: never materialize the (N1, N2)
        # distance matrix in HBM (ops/match_pallas.py; bit-identical for
        # hamming, reassociation-equal for l2). Hardware-validated 08-18
        # and ON by default on TPU (kernel_gate).
        from ..ops.match_pallas import (
            cross_check_match_fused,
            ratio_match_fused,
        )

        if m.cross_check:
            return cross_check_match_fused(
                det1[key], det2[key], det1["valid"], det2["valid"],
                max_matches=m.max_matches, norm=norm)
        ratio_eff = m.ratio if norm != "l2" else m.ratio ** 2
        return ratio_match_fused(
            det1[key], det2[key], det1["valid"], det2["valid"],
            ratio=ratio_eff, max_matches=m.max_matches, norm=norm)
    if norm == "hamming":
        D = hamming_distance_matrix(det1["bits"], det2["bits"])
    elif m.norm_type.lower() == "l2":
        D = l2sq_distance_matrix(det1["desc"], det2["desc"])
    else:
        raise ValueError(f"Unknown norm type: {m.norm_type}")
    if m.cross_check:
        return cross_check_match(D, det1["valid"], det2["valid"],
                                 max_matches=m.max_matches)
    ratio = m.ratio if m.norm_type.lower() != "l2" else m.ratio ** 2
    return ratio_test_match(D, det1["valid"], det2["valid"], ratio=ratio,
                            max_matches=m.max_matches)


def _estimate_pair_impl(img1, img2, K, key, cfg: EstimatorConfig):
    det1 = detect_features(img1, cfg)
    det2 = detect_features(img2, cfg)
    return _match_to_pose(det1, det2, K, key, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def estimate_pair(img1, img2, K, key, cfg: EstimatorConfig = EstimatorConfig()):
    return _estimate_pair_impl(img1, img2, K, key, cfg)


def zero_motion_gate(pts1, pts2, mvalid, num_matches, zm_px: float):
    """True when the pair is effectively static: median pixel flow over
    the valid matches is below `zm_px` (with at least 8 matches of
    evidence). At zero baseline the essential matrix is undefined — any E
    with both epipoles on the matches fits — so RANSAC's winner is
    backend-noise-dependent and recoverPose extracts an arbitrary
    rotation. The reference has no such guard and scores 180 deg on the
    simulator dataset's static-tail pairs (its own golden CSV, rows
    810-870); callers short-circuit to R=I, t=[0,0,1] instead
    (PARITY.md "zero-motion pairs"). Median (not mean) so outlier matches
    cannot fake motion; a real rotation of even 0.05 deg at f~700 moves
    the image ~0.6 px, above the 0.5 px default gate."""
    flow2 = jnp.sum((pts2 - pts1) ** 2, axis=-1)          # (M,) px^2
    fl = jnp.sort(jnp.where(mvalid, flow2, jnp.inf))
    med2 = jnp.take(fl, jnp.maximum(num_matches - 1, 0) // 2)
    return (num_matches >= 8) & (med2 < jnp.float32(zm_px) ** 2)


def _match_to_pose(det1, det2, K, key, cfg: EstimatorConfig):
    """Match -> RANSAC -> recoverPose given precomputed detections."""
    from ..utils.sanitize import audit_finite, audit_rotation

    audit_finite("detect", xy1=det1["xy"], xy2=det2["xy"],
                 score1=det1["score"], score2=det2["score"])
    matches = match_features(det1, det2, cfg)
    pts1 = jnp.take(det1["xy"], matches["idx1"], axis=0)
    pts2 = jnp.take(det2["xy"], matches["idx2"], axis=0)
    mvalid = matches["valid"]
    num_matches = jnp.sum(mvalid.astype(jnp.int32))

    with jax.default_matmul_precision("highest"):
        n1 = normalize_points(pts1, K)
        n2 = normalize_points(pts2, K)
        thr_n = cfg.ransac.threshold_px / (0.5 * (K[0, 0] + K[1, 1]))
        r = ransac_essential(
            key, n1, n2, mvalid, thr_n,
            num_hypotheses=cfg.ransac.num_hypotheses,
            refit_rounds=cfg.ransac.refit_rounds,
            solver=cfg.ransac.solver,
            degensac=cfg.ransac.degensac,
            lo=cfg.ransac.lo,
        )
        R, t, votes, _ = recover_pose(r["E"], n1, n2, mvalid,
                                      inlier_mask=r["inlier_mask"])

    audit_finite("ransac", E=r["E"])
    audit_rotation("recover_pose", R)
    valid = r["ok"] & (num_matches >= 5)
    eye = jnp.eye(3, dtype=R.dtype)
    t001 = jnp.array([0.0, 0.0, 1.0], dtype=t.dtype)
    if cfg.ransac.zero_motion_px > 0.0:
        zm = zero_motion_gate(pts1, pts2, mvalid, num_matches,
                              cfg.ransac.zero_motion_px)
        valid = valid | zm
    else:
        zm = jnp.zeros((), bool)
    R = jnp.where(valid & ~zm, R, eye)
    t = jnp.where(valid & ~zm, t, t001)
    return {
        "R": R, "t": t, "valid": valid,
        "num_matches": num_matches, "num_inliers": r["num_inliers"],
        "cheirality_votes": votes,
        "pts1": pts1, "pts2": pts2,
        "match_valid": mvalid, "inlier_mask": r["inlier_mask"],
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def estimate_pairs_batched(imgs1, imgs2, K, keys,
                           cfg: EstimatorConfig = EstimatorConfig()):
    """Batched pair estimation: (B, H, W) x2 -> per-pair pose dict.

    The TPU analogue of the reference's sequential frame loop
    (batch_processor.py:71). Detection runs as lax.map over the 2B images:
    the per-keypoint patch gathers lower to efficient single-image
    dynamic-slice gathers, where a vmapped batch would force the TPU's slow
    general-gather path (measured 2.8x). Matching/RANSAC/pose (dense,
    batch-friendly math) stay vmapped over pairs. With a mesh, shard the
    leading axis (parallel/mesh.py); pairs are embarrassingly parallel
    (SURVEY.md §2.3).
    """
    all_imgs = jnp.concatenate([imgs1, imgs2], axis=0)
    dets = jax.lax.map(lambda im: detect_features(im, cfg), all_imgs)
    b = imgs1.shape[0]
    det1 = jax.tree.map(lambda x: x[:b], dets)
    det2 = jax.tree.map(lambda x: x[b:], dets)
    fn = jax.vmap(
        lambda d1, d2, k: _match_to_pose(d1, d2, K, k, cfg),
        in_axes=(0, 0, 0),
    )
    return fn(det1, det2, keys)


@functools.partial(jax.jit, static_argnames=("cfg",))
def estimate_sequence_batched(imgs, K, keys,
                              cfg: EstimatorConfig = EstimatorConfig()):
    """Consecutive-pair estimation over a frame chunk: (B+1, H, W) -> B pairs.

    The sequence workload (every dataset runner, reference
    batch_processor.py:71) estimates pairs (i, i+1): each interior frame
    appears in TWO pairs, but the reference re-runs detectAndCompute on both
    images of every pair (src/core/pose_estimator.py:497-498). Here each
    unique frame is detected ONCE per chunk and its detections are shared by
    both adjacent pairs — detection is ~2/3 of the pair budget
    (docs/PERF_LOG.md stage budget), so this alone is worth ~1.6x on the
    full pipeline. Matching/RANSAC/pose are vmapped over the B pairs exactly
    as in `estimate_pairs_batched`.
    """
    dets = jax.lax.map(lambda im: detect_features(im, cfg), imgs)
    det1 = jax.tree.map(lambda x: x[:-1], dets)
    det2 = jax.tree.map(lambda x: x[1:], dets)
    fn = jax.vmap(
        lambda d1, d2, k: _match_to_pose(d1, d2, K, k, cfg),
        in_axes=(0, 0, 0),
    )
    return fn(det1, det2, keys)


class PoseEstimator:
    """Reference-compatible single-pair API over the fused jit core.

    Mirrors the reference constructor signature and error behavior
    (src/core/pose_estimator.py:19-65, :487-569): RuntimeError on missing
    descriptors / <5 matches / essential-matrix failure. VP refinement is
    applied when `use_vp_refinement` and `R_prev` are given, matching the
    gated fallback-accept semantics of pose_estimator.py:536-567.
    """

    def __init__(
        self,
        camera_matrix,
        feature_method: str = "ORB",
        norm_type: str = "Hamming",
        max_matches: int = 500,
        nfeatures: int = 4000,
        use_vp_refinement: bool = False,
        vp_max_lines: int = 120,
        vp_max_pairs: int = 3000,
        vp_acc_min: float = 8e5,
        vp_vp2_min: float = 8000.0,
        vp_iters: int = 12,
        vp_lm_lambda: float = 1e-2,
        vp_cost_improve_eps: float = 1e-3,
        seed: int = 0,
        config: EstimatorConfig | None = None,
    ):
        import dataclasses

        if config is None:
            config = EstimatorConfig()
        config = dataclasses.replace(
            config,
            feature_method=feature_method,
            orb=dataclasses.replace(config.orb, nfeatures=nfeatures),
            matcher=dataclasses.replace(
                config.matcher,
                norm_type=norm_type.lower(),
                max_matches=max_matches,
            ),
            vp=dataclasses.replace(
                config.vp,
                enabled=use_vp_refinement,
                max_lines=vp_max_lines,
                max_pairs=vp_max_pairs,
                acc_min=vp_acc_min,
                vp2_min=vp_vp2_min,
                iters=vp_iters,
                lm_lambda=vp_lm_lambda,
                cost_improve_eps=vp_cost_improve_eps,
            ),
        )
        if config.matcher.norm_type not in ("hamming", "l2"):
            raise ValueError(f"Unknown norm type: {norm_type}")
        if config.feature_method.upper() not in ("ORB", "SIFT"):
            raise ValueError(
                f"Unknown feature extraction method: {feature_method}")
        self.K = np.asarray(camera_matrix, dtype=np.float32)
        self.config = config
        self._seed = seed
        self._counter = 0

    def _next_key(self):
        key = jax.random.PRNGKey(self._seed + self._counter)
        self._counter += 1
        return key

    def estimate(self, img1, img2, R_prev=None):
        """Estimate relative pose; returns (R (3,3), t (3,1)) numpy arrays.

        Raises RuntimeError on failure, mirroring reference
        pose_estimator.py:508-530.
        """
        out = self.estimate_with_debug(img1, img2, R_prev)
        return out["R"], out["t"]

    def estimate_with_debug(self, img1, img2, R_prev=None):
        """Reference estimate_with_debug analogue (pose_estimator.py:571-688)."""
        i1 = jnp.asarray(np.asarray(img1), dtype=jnp.float32)
        i2 = jnp.asarray(np.asarray(img2), dtype=jnp.float32)
        out = estimate_pair(i1, i2, jnp.asarray(self.K), self._next_key(),
                            cfg=self.config)
        num_matches = int(out["num_matches"])
        if num_matches < 5:
            raise RuntimeError(
                f"Insufficient matches: {num_matches} (minimum 5 required)")
        if not bool(out["valid"]):
            raise RuntimeError("Could not estimate Essential matrix.")

        R_rel = np.asarray(out["R"], dtype=np.float64)
        t = np.asarray(out["t"], dtype=np.float64).reshape(3, 1)

        debug = {
            "R": R_rel,
            "t": t,
            "num_matches": num_matches,
            "pts1": np.asarray(out["pts1"])[np.asarray(out["match_valid"])],
            "pts2": np.asarray(out["pts2"])[np.asarray(out["match_valid"])],
            "inliers": int(out["cheirality_votes"]),
            "vp_used": False,
            "vp_debug": {},
        }

        if self.config.vp.enabled and R_prev is not None:
            from ..geometry.vp_refine import refine_rotation_with_vps

            R_ref, vp_used, vp_dbg = refine_rotation_with_vps(
                np.asarray(img1), np.asarray(img2),
                np.asarray(R_prev, dtype=np.float64), R_rel,
                self.K, self.config.vp,
            )
            debug["vp_debug"] = vp_dbg
            if vp_used:
                debug["R"] = R_ref
                debug["vp_used"] = True
        return debug
