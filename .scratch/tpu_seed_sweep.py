"""5-seed RANSAC sweep of all three datasets -> results/seed_stability.csv
+ seed_stability_summary.csv (the artifacts gated by
tests/test_seed_stability.py).

Single process: the jitted estimation programs are keyed by config (the
seed is data — a PRNGKey input), so each dataset's program compiles ONCE
and all 5 seeds reuse it (vs 15 multi-minute remote compiles for a
shell-loop sweep). Seeds are spaced wider than the largest frame index
(880) so per-pair key sets (seed + frame idx, pipeline/batch.py:149)
cannot overlap. ONE TPU process at a time — run alone.
"""
import csv
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

SEEDS = [0, 10000, 20000, 30000, 40000]
OUT = Path("/root/repo/results")
TMP = Path("/tmp/seed_sweep")


def run_dataset(name):
    from rpe_tpu.pipeline.calibration import load_K_npz
    from rpe_tpu.pipeline.orchestrator import PoseEstimationPipeline

    base = Path("/root/reference/evaluation-runs")
    common = dict(feature_method="ORB", norm_type="Hamming", max_matches=500)
    per_seed = {}
    for seed in SEEDS:
        rd = TMP / f"{name}_s{seed}"
        rd.mkdir(parents=True, exist_ok=True)
        if name == "sim":
            pipe = PoseEstimationPipeline(
                data_dir=base / "simulator-data/data",
                gt_filename="camera_poses.txt", calibration_file=None,
                results_dir=str(rd), euler_convention="yup", seed=seed,
                **common)
            step = 15
        elif name == "salah":
            data_dir = base / "vo_dataset_salah/data"
            pipe = PoseEstimationPipeline(
                data_dir=data_dir, gt_filename="camera_poses_zyx.txt",
                camera_matrix=load_K_npz(data_dir / "calibration.npz"),
                results_dir=str(rd), euler_convention="zyx", seed=seed,
                **common)
            step = 5
        else:  # phone
            data_dir = base / "phone-data/data"
            pipe = PoseEstimationPipeline(
                data_dir=data_dir, gt_filename="camera_poses_zyx.txt",
                calibration_file=str(data_dir / "calibration_scaled.npz"),
                results_dir=str(rd), euler_convention="zyx", seed=seed,
                **common)
            step = 5
        pipe.setup()
        pipe.run(step=step, create_plot=False, create_video=False)
        with open(rd / "evaluation_results.csv") as f:
            rows = list(csv.DictReader(f))
        per_seed[seed] = {int(float(r["frame"])): float(r["rotation_error"])
                          for r in rows}
        print(f"[sweep] {name} seed {seed}: mean "
              f"{np.mean(list(per_seed[seed].values())):.3f}", flush=True)
    return per_seed


def main():
    TMP.mkdir(parents=True, exist_ok=True)
    all_rows = []
    summary = []
    for name in ("sim", "salah", "phone"):
        per_seed = run_dataset(name)
        frames = sorted(next(iter(per_seed.values())))
        for fr in frames:
            errs = np.array([per_seed[s][fr] for s in SEEDS])
            all_rows.append(dict(
                dataset=name, frame=fr, rot_mean=errs.mean(),
                rot_min=errs.min(), rot_max=errs.max(),
                spread=errs.max() - errs.min()))
        means = np.array([np.mean(list(per_seed[s].values()))
                          for s in SEEDS])
        summary.append(dict(dataset=name, seeds=len(SEEDS),
                            mean_min=means.min(), mean_max=means.max(),
                            mean_spread=means.max() - means.min()))
        print(f"[sweep] {name}: dataset-mean spread "
              f"{means.max() - means.min():.3f} "
              f"(means {means.round(3).tolist()})", flush=True)

    with open(OUT / "seed_stability.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(all_rows[0]))
        w.writeheader()
        w.writerows(all_rows)
    with open(OUT / "seed_stability_summary.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(summary[0]))
        w.writeheader()
        w.writerows(summary)
    print("[sweep] wrote results/seed_stability.csv + summary", flush=True)


if __name__ == "__main__":
    main()
