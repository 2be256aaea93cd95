"""Chunked checkpoint/resume for the batch processor (SURVEY.md §5)."""

import numpy as np
import pytest

from rpe_tpu.config import EstimatorConfig, OrbConfig, MatcherConfig, RansacConfig
from rpe_tpu.pipeline.batch import BatchProcessor
from rpe_tpu.pipeline.estimator import PoseEstimator
from rpe_tpu.pipeline.ground_truth import GroundTruthLoader

SIM_DATA = "/root/reference/evaluation-runs/simulator-data/data"

TINY = EstimatorConfig(
    orb=OrbConfig(nfeatures=512, nlevels=3, max_kpts=512),
    matcher=MatcherConfig(max_matches=128),
    ransac=RansacConfig(num_hypotheses=256),
)


@pytest.fixture()
def processor_factory(tmp_path):
    gt = GroundTruthLoader(f"{SIM_DATA}/camera_poses.txt")
    gt.load()

    def make(ckpt):
        est = PoseEstimator(np.diag([600.0, 600.0, 1.0]), config=TINY)
        return BatchProcessor(
            images_dir=f"{SIM_DATA}/images", pose_estimator=est,
            ground_truth_loader=gt, euler_convention="yup",
            chunk=2, checkpoint_path=ckpt)

    return make, tmp_path / "ckpt.jsonl"


def test_checkpoint_resume_skips_computation(processor_factory):
    make, ckpt = processor_factory
    frames = [0, 15, 30, 45, 60]

    bp1 = make(ckpt)
    r1 = bp1.process_sequence(frames)
    assert ckpt.exists()
    lines = ckpt.read_text().splitlines()
    assert len(lines) == 5  # config-hash header + 4 pair records
    import json

    assert "config_hash" in json.loads(lines[0])

    # second run must restore everything from the checkpoint without a
    # single estimator dispatch
    bp2 = make(ckpt)
    calls = []
    import rpe_tpu.pipeline.batch as batch_mod

    orig = batch_mod.estimate_sequence_batched
    batch_mod.estimate_sequence_batched = (
        lambda *a, **k: calls.append(1) or orig(*a, **k))
    try:
        r2 = bp2.process_sequence(frames)
    finally:
        batch_mod.estimate_sequence_batched = orig
    assert calls == []
    np.testing.assert_allclose(
        np.stack(r1["R"]), np.stack(r2["R"]), atol=1e-12)
    np.testing.assert_array_equal(r1["valid"], r2["valid"])


def test_checkpoint_rejects_different_config(processor_factory):
    """A checkpoint written under a different estimator config (here: seed)
    at the same path must be discarded, not silently merged."""
    make, ckpt = processor_factory
    frames = [0, 15, 30]
    bp1 = make(ckpt)
    bp1.process_sequence(frames)

    bp2 = make(ckpt)
    bp2.seed = 1234  # part of the config hash
    calls = []
    import rpe_tpu.pipeline.batch as batch_mod

    orig = batch_mod.estimate_sequence_batched
    batch_mod.estimate_sequence_batched = (
        lambda *a, **k: calls.append(1) or orig(*a, **k))
    try:
        bp2.process_sequence(frames)
    finally:
        batch_mod.estimate_sequence_batched = orig
    assert calls, "stale-config checkpoint must force recomputation"


def test_checkpoint_ignores_stale_frames(processor_factory):
    make, ckpt = processor_factory
    bp1 = make(ckpt)
    bp1.process_sequence([0, 15, 30])
    # different frame list -> stale entries ignored, recompute happens
    bp2 = make(ckpt)
    r = bp2.process_sequence([45, 60, 75])
    assert len(r["frames"]) == 2


def test_checkpoint_salt_isolates_dataset_slices(processor_factory):
    """checkpoint_salt (the KITTI runner's dataset-slice identity) must be
    part of the config hash: positional frame ids match trivially across
    different --step/--images-dir slices, so without the salt a rerun
    would silently resume foreign poses (round-3 self-review finding)."""
    make, ckpt = processor_factory
    frames = [0, 15, 30]
    bp1 = make(ckpt)
    bp1.checkpoint_salt = "images-A|step=1"
    bp1.process_sequence(frames)

    bp2 = make(ckpt)
    bp2.checkpoint_salt = "images-B|step=2"
    calls = []
    import rpe_tpu.pipeline.batch as batch_mod

    orig = batch_mod.estimate_sequence_batched
    batch_mod.estimate_sequence_batched = (
        lambda *a, **k: calls.append(1) or orig(*a, **k))
    try:
        bp2.process_sequence(frames)
    finally:
        batch_mod.estimate_sequence_batched = orig
    assert calls, "different-salt checkpoint must force recomputation"
