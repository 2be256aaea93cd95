"""Inlier-collapse fallback (round-5 verdict #9): a work-cut profile
pair whose inliers collapse is re-estimated at the configured stronger
profile (config.EstimatorConfig.fallback_*, pipeline/batch.py). The
reference has no analogue — a failed pair aborts the whole run
(src/core/pose_estimator.py:529-530)."""

import dataclasses

import numpy as np
import pytest

from rpe_tpu.config import (
    EstimatorConfig,
    MatcherConfig,
    OrbConfig,
    RansacConfig,
    profile_config,
)
from rpe_tpu.pipeline.batch import BatchProcessor
from rpe_tpu.pipeline.ground_truth import GroundTruthLoader

SIM_DATA = "/root/reference/evaluation-runs/simulator-data/data"

# deliberately starved primary config: few features on few levels AND
# the pre-pooling band-8/cap-8 extraction (the round-5 band=32/cap=72
# default POOLS slots and rescued enough keypoints on sim frame 0 that
# the fallback no longer strictly beat it on match count) so the
# stronger fallback profile (orb512) reliably finds MORE inliers
WEAK = EstimatorConfig(
    orb=OrbConfig(nfeatures=128, nlevels=2, max_kpts=128, band=8,
                  extract_cap=8),
    matcher=MatcherConfig(max_matches=64),
    ransac=RansacConfig(num_hypotheses=64),
)


def _run(cfg, tmp_path, ckpt=None):
    from rpe_tpu.pipeline.estimator import PoseEstimator

    gt = GroundTruthLoader(f"{SIM_DATA}/camera_poses.txt")
    gt.load()
    est = PoseEstimator(np.diag([600.0, 600.0, 1.0]), config=cfg)
    bp = BatchProcessor(
        images_dir=f"{SIM_DATA}/images", pose_estimator=est,
        ground_truth_loader=gt, euler_convention="yup", chunk=2,
        checkpoint_path=ckpt)
    frames = [0, 15, 30]
    paths = [str(bp.get_image_path(f)) for f in frames]
    from rpe_tpu.io.image_loader import LazyFrameSource

    imgs = LazyFrameSource(paths, to_gray=True)
    return bp._estimate_all_pairs(frames, imgs)


def test_profile_config_fallback_fields():
    cfg = profile_config("orb512")
    assert cfg.fallback_profile == "orb1000"
    assert cfg.fallback_min_inliers == 25
    assert profile_config("parity").fallback_profile is None


@pytest.mark.slow
def test_fallback_reestimates_collapsed_pairs(tmp_path, capsys):
    # threshold above anything the starved config can reach -> every
    # pair triggers; the orb512 fallback finds strictly more inliers on
    # real sim frames and its answers are adopted
    cfg = dataclasses.replace(WEAK, fallback_profile="orb512",
                              fallback_min_inliers=10 ** 5)
    R_f, t_f, v_f, nm_f = _run(cfg, tmp_path)
    out = capsys.readouterr().out
    assert "Fallback: re-running 2 collapsed pair(s)" in out
    assert v_f.all()

    base = dataclasses.replace(WEAK)
    R_b, t_b, v_b, nm_b = _run(base, tmp_path)
    # adopted answers come from the stronger profile: more matches kept
    assert (nm_f > nm_b).all(), (nm_f, nm_b)
    assert not np.allclose(R_f, R_b)
