"""Frozen configuration dataclasses (static hashable jit arguments).

Mirrors the reference's constructor knobs and defaults exactly
(reference: src/core/pose_estimator.py:19-65, src/pipeline.py:25-50):
nfeatures=4000, scaleFactor=1.1, nlevels=12, fastThreshold=15,
max_matches=500, RANSAC prob=0.999/threshold=1.0 px, VP gates 8e5/8e3.
Static-shape knobs (max_kpts, num_hypotheses) are TPU additions
(SURVEY.md §7: capped-size + validity-mask arrays replace dynamic shapes).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    nfeatures: int = 4000
    nlevels: int = 12
    scale_factor: float = 1.1
    fast_threshold: float = 15.0
    max_kpts: int = 4096  # static keypoint slots (>= nfeatures)
    # TPU-only static knob: extraction slots per `band`-row atlas band
    # (ops/atlas.banded_extract `cap`). Extraction cost ~ NB*cap (the
    # measured per-slot floor, docs/PERF_LOG.md round 4); too small drops
    # clustered keypoints (.scratch/cap_occupancy_lab.py and the round-5
    # pooled-occupancy tables have measured drop/cap numbers). Must be a
    # multiple of 4. Default 72 pairs with band=32 below (the round-5
    # pooled-banding adoption): 98.8% of the band=8/cap=24 keypoint
    # retention on the bench frame at -25% slots.
    extract_cap: int | None = 72
    # Extraction band row height (8/16/32; ops/atlas.banded_extract
    # `band`). Wider bands POOL slot capacity so clustered rows borrow
    # slots from sparse neighbors (round-5 pooled banding): the same
    # keypoint drop rate needs fewer total slots = less extraction time.
    # Default 32 ADOPTED round 5 with the v6 quad kernel (interleaved
    # hardware A/B 08-20: full detect 3.459 vs 3.607 ms/image at band=8;
    # the v3 kernel's per-slot masked accumulate grows 4x at band=32, so
    # band=32 routes through the quad MXU row-select — ops/fast.py
    # _VALIDATED_KERNEL_GATES). Function-level defaults in ops/ stay
    # band=8 (oracle tests, band-generic kernels); this config default is
    # what production, bench, and the committed goldens ride.
    band: int = 32


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    nfeatures: int = 4000
    # cv2 runs octaves down to ~8 px; 6 covers cv2 octaves -1..4 (larger
    # sizes contribute a handful of keypoints on these image sizes)
    noctaves: int = 6
    scales_per_octave: int = 3
    contrast_threshold: float = 0.04
    edge_threshold: float = 10.0
    sigma: float = 1.6
    max_kpts: int = 4096


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    norm_type: str = "hamming"    # "hamming" | "l2"
    cross_check: bool = True      # reference default; False -> Lowe ratio
    ratio: float = 0.75           # used when cross_check is False
    max_matches: int = 500        # reference pose_estimator.py:23


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    num_hypotheses: int = 256     # minimal samples (replaces prob=0.999
    # adaptive iteration; 5pt yields up to 10 models per sample -> ~2.5k
    # hypotheses scored, and 5-point samples have far higher all-inlier
    # probability than 8-point ones)
    threshold_px: float = 1.0     # reference pose_estimator.py:526
    refit_rounds: int = 2
    solver: str = "5pt"           # "5pt" (Nister, cv2.findEssentialMat's
    # algorithm — REQUIRED for planar scenes, where 8-point degenerates:
    # the Salah dataset produced 19 catastrophic pairs with 8pt vs 4 for
    # the reference; 5pt matches OpenCV within ~1-3 deg on those pairs)
    # | "8pt" (faster; fine for non-planar scenes)
    degensac: bool = True         # degeneracy handling (default ON since
    # round 4). Two fixed-shape mechanisms appended to ransac_essential:
    # (1) dominant-plane rescue (geometry/homography.degensac_rescue):
    # when a homography explains >= 80% of the winning E's inliers OR
    # GRIC prefers H over E, re-estimate via plane-and-parallax and adopt
    # iff off-plane support wins (synthetic-exact, tests/
    # test_homography.py); (2) count-tie ambiguity blend (geometry/
    # ambiguity.py): tied-count winners spread > 2.5 deg in rotation are
    # a flat likelihood valley no image-resident criterion separates
    # (ambiguity.py docstring has the measurements) — return their
    # count^2-weighted chordal mean. Measured on sim 150->165 (12
    # seeds): worst 8.01 -> 4.51 deg vs the reference's 5.77
    # (cv2.findEssentialMat has no degeneracy handling, reference
    # src/core/pose_estimator.py:522-527). False restores plain
    # count+cheirality selection.
    lo: bool = False              # LO-RANSAC local optimization (round 5,
    # verdict #7): threshold-annealed (4x->2x->1.4x->1x) weighted-8pt
    # ladder on the winner accepted by truncated MSAC loss, run before
    # the plain refit rounds — merges the per-seed minimal-sample basins
    # that spread 29/80 salah pairs > 1 deg across seeds. Opt-in until
    # the TPU golden/seed-sweep A/B adopts it (flipping it changes every
    # committed golden). No reference counterpart: cv2.findEssentialMat
    # has no polish at all (src/core/pose_estimator.py:522-527).
    zero_motion_px: float = 0.5   # static-pair gate: when the MEDIAN pixel
    # flow over valid matches is below this, the pair is declared
    # zero-motion and R=I, t=[0,0,1] is returned instead of the essential
    # decomposition (which is undefined at zero baseline — the reference
    # scores 180 deg on the simulator dataset's 5 static-tail pairs,
    # evaluation-runs/simulator-data/results/evaluation_results.csv rows
    # 810-870). 0 disables (restores reference behavior). Documented
    # deviation: PARITY.md "zero-motion pairs".


@dataclasses.dataclass(frozen=True)
class VpConfig:
    """Vanishing-point refinement knobs (reference pose_estimator.py:26-32)."""
    enabled: bool = False
    max_lines: int = 120
    max_pairs: int = 3000
    acc_min: float = 8e5
    vp2_min: float = 8000.0
    iters: int = 12
    lm_lambda: float = 1e-2
    cost_improve_eps: float = 1e-3


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    feature_method: str = "ORB"   # "ORB" | "SIFT"
    orb: OrbConfig = OrbConfig()
    sift: SiftConfig = SiftConfig()
    matcher: MatcherConfig = MatcherConfig()
    ransac: RansacConfig = RansacConfig()
    vp: VpConfig = VpConfig()
    # Inlier-collapse fallback (round 5, verdict #9): when a work-cut
    # profile leaves a pair with < fallback_min_inliers inliers (or
    # invalid), the batch pipeline re-estimates JUST that pair at the
    # named stronger profile (pipeline/batch.py). 0 / None disables —
    # parity never falls back. The reference has no analogue (a failed
    # pair aborts the whole run, src/core/pose_estimator.py:529-530).
    fallback_profile: str | None = None
    fallback_min_inliers: int = 0


# ORB work-cut profiles (opt-in; CLI --profile / bench.py --profile).
# "parity" is the reference configuration (nfeatures=4000 and nlevels=12
# hardcoded at reference src/pipeline.py:99 and
# src/core/pose_estimator.py:84-91 — knobs the reference never tuned).
# The cut profiles shrink the three work terms that bound throughput on
# this chip (docs/PERF_LOG.md roofline: extraction slots ~ nfeatures,
# matcher dot ~ max_kpts^2, atlas rows ~ nlevels): measured pairs/s and
# per-dataset accuracy for each profile live in docs/API.md ("Profiles").
# max_kpts stays a multiple of 128 (fused-matcher lane constraint,
# pipeline/estimator.py match_features).
_PROFILES = {
    "parity": {},
    # extract_cap sizing (round 4, .scratch/cap_occupancy_lab.py on real
    # frames): extraction costs ~NB*cap slots x 260 ns, and the measured
    # per-band keypoint drop sets the floor — orb2000 still clusters
    # (sim drops 4.9% at cap 24) so it keeps the default; orb1000 at
    # cap 16 drops 3.0% (sim) / 8.1% (bench shape) for a 33% slot cut;
    # orb512 at cap 12 drops ~4% for a 50% slot cut (max-speed tier).
    # orb2000 inherits the band=32/cap=72 pooled default; orb1000/orb512
    # keep their MEASURED band=8 configs (their small caps are sized in
    # per-8-row units — docs/API.md "Profiles").
    "orb2000": {"orb": {"nfeatures": 2000, "nlevels": 8, "max_kpts": 2048}},
    "orb1000": {"orb": {"nfeatures": 1000, "nlevels": 6, "max_kpts": 1024,
                        "extract_cap": 16, "band": 8}},
    # max-speed tier: also cuts the constant-cost stages (the 5pt RANSAC
    # batch and the match cap) that dominate once detection shrinks —
    # 128 minimal samples ~ OpenCV's adaptive iteration count at a ~55%
    # inlier ratio (prob 0.999), so low-texture pairs lose oversampling
    # margin; measured accuracy per dataset in docs/API.md "Profiles".
    # orb512's speed cuts leave ~3 catastrophic pairs on the sim
    # low-texture stretch (frames 630-750, docs/API.md "Profiles");
    # inlier collapse there is detectable, so those pairs re-run at
    # orb1000 host-side (pipeline/batch.py fallback; threshold from the
    # stretch's measured inlier counts — healthy orb512 pairs average
    # ~170 inliers, the catastrophic ones collapse below ~25).
    "orb512": {"orb": {"nfeatures": 512, "nlevels": 4, "max_kpts": 512,
                       "extract_cap": 12, "band": 8},
               "matcher": {"max_matches": 256},
               "ransac": {"num_hypotheses": 128},
               "fallback_profile": "orb1000",
               "fallback_min_inliers": 25},
}

PROFILE_NAMES = tuple(_PROFILES)


def profile_config(name: str = "parity",
                   base: EstimatorConfig | None = None) -> EstimatorConfig:
    """EstimatorConfig for a named ORB work-cut profile."""
    if name not in _PROFILES:
        raise ValueError(
            f"Unknown profile {name!r}; choose from {PROFILE_NAMES}")
    cfg = base if base is not None else EstimatorConfig()
    for field, over in _PROFILES[name].items():
        if isinstance(over, dict):
            over = dataclasses.replace(getattr(cfg, field), **over)
        cfg = dataclasses.replace(cfg, **{field: over})
    return cfg
