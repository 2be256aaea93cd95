"""Shared CLI plumbing for the dataset runners.

Datasets ship with the reference checkout (read-only at /root/reference in
this environment); results are written under the local repo. Override with
--data-root / RPE_DATA_ROOT and --results-dir.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def default_data_root() -> str:
    root = os.environ.get("RPE_DATA_ROOT")
    if root:
        return root
    if Path("/root/reference/evaluation-runs").exists():
        return "/root/reference"
    return "."


def sequence_parser(description: str, default_step: int,
                    default_fps: int) -> argparse.ArgumentParser:
    """argparse flags mirroring the reference runners
    (run_phone_data.py:13-19 etc.) plus data-root/results overrides."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--step", type=int, default=default_step,
                   help=f"Frame step interval (default: {default_step})")
    p.add_argument("--no-plot", action="store_true",
                   help="Skip plot generation")
    p.add_argument("--no-video", action="store_true",
                   help="Skip video generation")
    p.add_argument("--video-fps", type=int, default=default_fps,
                   help=f"Video FPS (default: {default_fps})")
    p.add_argument("--data-root", default=default_data_root(),
                   help="Root containing evaluation-runs/ (default: "
                        "reference checkout)")
    p.add_argument("--results-dir", default=None,
                   help="Results directory (default: local "
                        "evaluation-runs/<dataset>/results)")
    p.add_argument("--chunk", type=int, default=32,
                   help="Pairs per compiled dispatch (static batch size; "
                        "32 amortizes the ~0.9 ms/pair dispatch cost "
                        "measured at chunk 8, docs/PERF_LOG.md)")
    p.add_argument("--devices", type=int, default=0,
                   help="Shard pairs over this many devices (0 = no mesh)")
    p.add_argument("--seed", type=int, default=0,
                   help="RANSAC base seed (per-pair key = seed + frame "
                        "index; sweep seeds spaced wider than the max "
                        "frame index, e.g. multiples of 100000)")
    from ..config import PROFILE_NAMES

    p.add_argument("--profile", choices=PROFILE_NAMES, default="parity",
                   help="ORB work-cut profile (default: parity = the "
                        "reference's nfeatures=4000/nlevels=12; see "
                        "docs/API.md 'Profiles' for measured speed/accuracy"
                        " trade-offs)")
    p.add_argument("--feature", choices=["ORB", "SIFT"], default="ORB",
                   help="Feature family (reference pipeline.py:32 "
                        "feature_method). SIFT switches matching to L2 "
                        "with the reference's crossCheck semantics "
                        "(pose_estimator.py:115-131); profiles/extract-cap "
                        "are ORB-only knobs and are ignored under SIFT")
    p.add_argument("--extract-cap", type=int, default=None,
                   help="Extraction slots per 8-row atlas band (multiple "
                        "of 4; default: the profile's cap, 24 at parity). "
                        "Detect time scales with it; high-res datasets "
                        "tolerate 16 with ~1%% keypoint drop (measured "
                        "occupancy tables in docs/API.md 'Profiles')")
    return p


def make_mesh(n_devices: int):
    if n_devices <= 0:
        return None
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), ("pairs",))
