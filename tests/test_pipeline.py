"""End-to-end pipeline regression against the reference's committed golden
CSV (SURVEY.md §4: the three committed evaluation CSVs are the de-facto
regression fixtures; comparison is statistical since RANSAC sampling
differs)."""

import numpy as np
import pandas as pd
import pytest

from rpe_tpu.pipeline.orchestrator import PoseEstimationPipeline

SIM_DATA = "/root/reference/evaluation-runs/simulator-data/data"
SIM_GOLDEN = ("/root/reference/evaluation-runs/simulator-data/results/"
              "evaluation_results.csv")


@pytest.fixture(scope="module")
def sim_pipeline(tmp_path_factory):
    pipe = PoseEstimationPipeline(
        data_dir=SIM_DATA,
        gt_filename="camera_poses.txt",
        results_dir=str(tmp_path_factory.mktemp("sim_results")),
        feature_method="ORB",
        norm_type="Hamming",
        max_matches=500,
        euler_convention="yup",
        use_vp_refinement=False,  # VP gates never fire on simulator data
        chunk=5,
    )
    pipe.setup()
    return pipe


def test_simulator_subset_matches_golden(sim_pipeline):
    """First 5 pairs at step=15 vs the golden CSV: same accuracy class."""
    frames = sim_pipeline.gt_loader.get_frame_indices(step=15)[:6]
    est = sim_pipeline.batch_processor.process_sequence(frames)
    ev = sim_pipeline.pose_evaluator.evaluate_sequence(est)

    golden = pd.read_csv(SIM_GOLDEN)
    g = golden[golden.frame.isin(est["frames"])].sort_values("frame")
    assert len(g) == len(est["frames"])

    ours = np.asarray(ev["rotation_error"])
    theirs = g["rotation_error"].to_numpy()
    # parity contract: our mean must not be worse than golden + 0.5 deg
    assert ours.mean() <= theirs.mean() + 0.5, (ours, theirs)
    # per-pair errors in the same class (each within golden + 2.5 deg)
    assert (ours <= theirs + 2.5).all(), (ours, theirs)


def test_salah_subset_matches_golden(tmp_path_factory):
    """First 6 pairs of the hardest dataset (near-planar indoor scene,
    zyx convention) vs its golden CSV — the regime where the 5pt solver,
    chart flip, and cheirality re-rank earn their keep. Statistical gate:
    mean within golden + 1 deg, no new catastrophic pair in the prefix."""
    base = "/root/reference/evaluation-runs/vo_dataset_salah"
    from rpe_tpu.pipeline.calibration import load_K_npz

    pipe = PoseEstimationPipeline(
        data_dir=f"{base}/data",
        gt_filename="camera_poses_zyx.txt",
        camera_matrix=load_K_npz(f"{base}/data/calibration.npz"),
        results_dir=str(tmp_path_factory.mktemp("salah_results")),
        feature_method="ORB",
        norm_type="Hamming",
        max_matches=500,
        euler_convention="zyx",
        use_vp_refinement=False,
        chunk=6,
    )
    pipe.setup()
    frames = pipe.gt_loader.get_frame_indices(step=5)[:7]
    est = pipe.batch_processor.process_sequence(frames)
    ev = pipe.pose_evaluator.evaluate_sequence(est)

    golden = pd.read_csv(f"{base}/results/evaluation_results.csv")
    g = golden[golden.frame.isin(est["frames"])].sort_values("frame")
    assert len(g) == len(est["frames"])
    ours = np.asarray(ev["rotation_error"])
    theirs = g["rotation_error"].to_numpy()
    assert ours.mean() <= theirs.mean() + 1.0, (ours, theirs)
    assert (ours <= np.maximum(theirs + 3.0, 10.0)).all(), (ours, theirs)
    assert not (ours > 90).any(), f"catastrophic pair in prefix: {ours}"


def test_comparison_csv_schema(sim_pipeline, tmp_path):
    frames = sim_pipeline.gt_loader.get_frame_indices(step=15)[:3]
    est = sim_pipeline.batch_processor.process_sequence(frames)
    ev = sim_pipeline.pose_evaluator.evaluate_sequence(est)
    df = sim_pipeline.pose_evaluator.create_comparison_dataframe(ev)
    golden_cols = list(pd.read_csv(SIM_GOLDEN).columns)
    assert list(df.columns) == golden_cols  # 12-column parity contract
    out = tmp_path / "evaluation_results.csv"
    df.to_csv(out, index=False)
    assert pd.read_csv(out).shape == (2, 12)


def test_summary_statistics_keys(sim_pipeline):
    frames = sim_pipeline.gt_loader.get_frame_indices(step=15)[:3]
    est = sim_pipeline.batch_processor.process_sequence(frames)
    ev = sim_pipeline.pose_evaluator.evaluate_sequence(est)
    stats = sim_pipeline.pose_evaluator.compute_summary_statistics(ev)
    for metric in ["roll_error", "pitch_error", "yaw_error",
                   "rotation_error", "translation_dir_error"]:
        for agg in ["mean", "std", "median", "max", "min"]:
            assert f"{metric}_{agg}" in stats


def test_ground_truth_loader_api():
    from rpe_tpu.pipeline.ground_truth import GroundTruthLoader

    gt = GroundTruthLoader(f"{SIM_DATA}/camera_poses.txt")
    gt.load()
    pose = gt.get_pose(15)
    assert set(pose) == {"frame", "x", "y", "z", "roll", "pitch", "yaw"}
    with pytest.raises(KeyError):
        gt.get_pose(999999)
    idx = gt.get_frame_indices(step=15)
    assert (idx % 15 == 0).all()
    traj = gt.get_trajectory(step=15)
    ori = gt.get_orientations(step=15)
    assert traj.shape == (len(idx), 3)
    assert ori.shape == (len(idx), 3)
    pos, rpy = gt.poses_for_frames(idx[:4])
    np.testing.assert_allclose(pos[1], traj[1])


def test_camera_calibration_priorities(tmp_path):
    from rpe_tpu.pipeline.calibration import CameraCalibration, load_K_npz

    K_direct = np.diag([100.0, 110.0, 1.0])
    cc = CameraCalibration(camera_matrix=K_direct)
    np.testing.assert_allclose(cc.get_matrix(), K_direct)

    npz = tmp_path / "cal.npz"
    np.savez(npz, K=np.diag([50.0, 60.0, 1.0]))
    cc2 = CameraCalibration(calibration_file=str(npz))
    np.testing.assert_allclose(cc2.get_matrix()[0, 0], 50.0)

    cc3 = CameraCalibration()
    K = cc3.get_matrix(960, 720)
    np.testing.assert_allclose(K[0, 0], 924.82939686)
    K2 = cc3.get_matrix(480, 360)  # half size -> half intrinsics
    np.testing.assert_allclose(K2[0, 0], 924.82939686 / 2)
    with pytest.raises(ValueError):
        CameraCalibration(camera_matrix=np.eye(4))
    with pytest.raises(FileNotFoundError):
        CameraCalibration(calibration_file="/nonexistent.npz")

    np.savez(tmp_path / "flat.npz", intrinsic_matrix=np.arange(9.0))
    K3 = load_K_npz(tmp_path / "flat.npz")
    assert K3.shape == (3, 3)


def test_run_single_pair_method(sim_pipeline, capsys):
    """pipeline.run_single_pair prints estimate + GT block and returns the
    reference dict shape (reference pipeline.py:199-256)."""
    res = sim_pipeline.run_single_pair(0, 15, show_debug=True)
    assert set(res) == {"R", "t", "yaw", "pitch", "roll",
                        "gt_pose1", "gt_pose2"}
    assert res["R"].shape == (3, 3)
    out = capsys.readouterr().out
    assert "Estimated relative pose" in out
    assert "Ground truth poses" in out
    assert "[DEBUG] Number of matches:" in out


def test_visualizer_artifacts(sim_pipeline, tmp_path):
    from rpe_tpu.viz.visualizer import Visualizer

    frames = sim_pipeline.gt_loader.get_frame_indices(step=15)[:3]
    est = sim_pipeline.batch_processor.process_sequence(frames)
    ev = sim_pipeline.pose_evaluator.evaluate_sequence(est)
    viz = Visualizer(tmp_path)
    html = viz.plot_3d_trajectory(
        gt_trajectory_full=sim_pipeline.gt_loader.get_trajectory(step=1),
        gt_trajectory_filtered=sim_pipeline.gt_loader.get_trajectory(step=15),
        gt_orientations_filtered=sim_pipeline.gt_loader.get_orientations(step=15),
        evaluation_results=ev, step=15)
    text = open(html).read()
    assert "Orientation" in text and len(text) > 1000

    video = viz.create_video(f"{SIM_DATA}/images", ev,
                             output_filename="out.mp4", fps=5)
    import os

    assert os.path.getsize(video) > 1000
