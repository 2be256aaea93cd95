"""cv2-SIFT reference run of the simulator step-15 sequence (host CPU).

Produces the comparison column for the round-5 SIFT sequence accuracy
table (VERDICT #8): the reference's SIFT branch
(src/core/pose_estimator.py:93-94, BFMatcher NORM_L2 crossCheck=True
:115-131, sort+truncate 500 :144-152, findEssentialMat/recoverPose
:522-533) driven by the same GT anchoring as src/core/batch_processor.py
(R_prev from GT, R_new = R_prev @ R_rel), evaluated with rpe_tpu's own
f64 evaluator (identical metric formulas to the reference's
pose_evaluator.py). Writes /tmp/sift_cv2_sim/evaluation_results.csv.

Pure host-side — safe to run while a TPU session is live.
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # NEVER touch the TPU from a lab

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from rpe_tpu.pipeline.calibration import CameraCalibration  # noqa: E402
from rpe_tpu.pipeline.evaluator import PoseEvaluator  # noqa: E402
from rpe_tpu.pipeline.ground_truth import GroundTruthLoader  # noqa: E402
from rpe_tpu.geometry.rotations import (  # noqa: E402
    euler_to_rotation_np, rotation_to_euler)

DATA = Path("/root/reference/evaluation-runs/simulator-data/data")
OUT = Path("/tmp/sift_cv2_sim")
STEP = 15


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    gt = GroundTruthLoader(DATA / "camera_poses.txt")
    gt.load()
    frames = gt.get_frame_indices(STEP)
    sample = cv2.imread(str(DATA / "images" / f"{frames[0]:06d}.png"),
                        cv2.IMREAD_GRAYSCALE)
    K = CameraCalibration().get_matrix_from_image(sample).astype(np.float64)

    sift = cv2.SIFT_create(nfeatures=4000)
    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)

    est = {"frames": [], "roll": [], "pitch": [], "yaw": [],
           "R": [], "t": []}
    for f1, f2 in zip(frames[:-1], frames[1:]):
        i1 = cv2.imread(str(DATA / "images" / f"{f1:06d}.png"),
                        cv2.IMREAD_GRAYSCALE)
        i2 = cv2.imread(str(DATA / "images" / f"{f2:06d}.png"),
                        cv2.IMREAD_GRAYSCALE)
        kp1, d1 = sift.detectAndCompute(i1, None)
        kp2, d2 = sift.detectAndCompute(i2, None)
        ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:500]
        p1 = np.float64([kp1[m.queryIdx].pt for m in ms])
        p2 = np.float64([kp2[m.trainIdx].pt for m in ms])
        E, _ = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC,
                                    prob=0.999, threshold=1.0)
        if E is None or E.shape != (3, 3):
            E = E[:3, :3] if E is not None else np.eye(3)
        _, R_rel, t, _ = cv2.recoverPose(E, p1, p2, K)

        pose1 = gt.get_pose(f1)
        R_prev = euler_to_rotation_np(
            np.float64(pose1["yaw"]), np.float64(pose1["pitch"]),
            np.float64(pose1["roll"]), convention="yup")
        R_new = R_prev @ R_rel
        y, p, r = (float(np.asarray(v))
                   for v in rotation_to_euler(R_new, convention="yup"))
        est["frames"].append(f2)
        est["roll"].append(r)
        est["pitch"].append(p)
        est["yaw"].append(y)
        est["R"].append(R_new)
        est["t"].append(t.reshape(3))
        print(f"[cv2-sift] pair {f1}->{f2}: {len(ms)} matches", flush=True)

    ev = PoseEvaluator(gt, euler_convention="yup")
    res = ev.evaluate_sequence(est)
    ev.print_summary(res)
    df = ev.create_comparison_dataframe(res)
    df.to_csv(OUT / "evaluation_results.csv", index=False)
    print(f"[cv2-sift] wrote {OUT}/evaluation_results.csv", flush=True)


if __name__ == "__main__":
    main()
