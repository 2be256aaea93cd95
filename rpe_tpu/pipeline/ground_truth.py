"""Ground-truth pose loading (reference: src/core/ground_truth_loader.py).

Same file format (whitespace-separated `frame x y z roll pitch yaw`, degrees)
and the same API, plus vectorized accessors feeding the batched TPU pipeline
(per-row dict lookups would force a host round-trip per pair).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


class GroundTruthLoader:
    """Loads and serves ground-truth camera poses.

    API mirror of reference ground_truth_loader.py:22-133; `poses_for_frames`
    is the TPU addition returning dense arrays for a whole frame list.
    """

    def __init__(self, gt_path):
        self.gt_path = Path(gt_path)
        self.df = None

    def load(self):
        self.df = pd.read_csv(self.gt_path, sep=r"\s+")
        return self.df

    def _require_loaded(self):
        if self.df is None:
            raise RuntimeError("Ground truth not loaded. Call load() first.")

    def get_pose(self, frame_idx):
        """Pose dict for one frame; KeyError if absent (reference :43-69)."""
        self._require_loaded()
        matches = self.df[self.df["frame"] == frame_idx]
        if matches.empty:
            raise KeyError(f"Frame {frame_idx} not found in ground truth data")
        row = matches.iloc[0]
        return {
            "frame": int(row["frame"]),
            "x": float(row["x"]),
            "y": float(row["y"]),
            "z": float(row["z"]),
            "roll": float(row["roll"]),
            "pitch": float(row["pitch"]),
            "yaw": float(row["yaw"]),
        }

    def get_frame_indices(self, step: int = 1):
        """Frames whose *number* is divisible by step (reference :71-85 —
        modulo on the frame number, not the row position)."""
        self._require_loaded()
        return self.df[self.df["frame"] % step == 0]["frame"].values

    def get_all_frames(self):
        self._require_loaded()
        return self.df["frame"].values

    def get_trajectory(self, step: int = 1):
        """(N, 3) positions at the step interval (reference :99-115)."""
        self._require_loaded()
        sub = self.df[self.df["frame"] % step == 0]
        return sub[["x", "y", "z"]].values

    def get_orientations(self, step: int = 1):
        """(N, 3) [roll, pitch, yaw] at the step interval (reference :117-133)."""
        self._require_loaded()
        sub = self.df[self.df["frame"] % step == 0]
        return sub[["roll", "pitch", "yaw"]].values

    # -- TPU batched accessor ------------------------------------------------

    def poses_for_frames(self, frames):
        """Dense arrays for a frame list: (positions (N,3), rpy (N,3) degrees).

        KeyError on any missing frame, same contract as get_pose.
        """
        self._require_loaded()
        indexed = self.df.set_index("frame")
        missing = [f for f in frames if f not in indexed.index]
        if missing:
            raise KeyError(f"Frame {missing[0]} not found in ground truth data")
        sub = indexed.loc[list(frames)]
        pos = sub[["x", "y", "z"]].to_numpy(dtype=np.float64)
        rpy = sub[["roll", "pitch", "yaw"]].to_numpy(dtype=np.float64)
        return pos, rpy
