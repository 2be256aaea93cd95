"""Throughput benchmark: image pairs/sec/chip on KITTI-sized frames.

Runs the fused batched estimator (full default config: ORB-4000 x 12 levels,
500 cross-checked matches, 256-sample 5pt Nister RANSAC, cheirality
recoverPose)
on 1241x376 grayscale pairs — the BASELINE.json north-star configuration —
on the default JAX platform (the real TPU chip under the driver).

`vs_baseline` is measured against the CPU/OpenCV reference pipeline
(cv2.ORB -> BFMatcher(crossCheck) -> findEssentialMat(RANSAC) -> recoverPose,
the exact call chain of reference src/core/pose_estimator.py:487-533) timed
on the same frames on this host.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H, W = 376, 1241  # KITTI camera geometry
# 128 won the hardware chunk sweep (08-18, .scratch/tpu_chunk_sweep.py:
# 4.39 ms/pair at B=128 vs 4.59 at B=32 with all validated kernels).
BATCH = 128
ITERS = 6


def _batch_from_sweep() -> int:
    """Use the hardware chunk-sweep winner when a NEWER one is on record
    (.scratch/tpu_chunk_sweep.py writes /tmp/bench_batch.txt after the
    tunnel-recovery validation flow); default BATCH otherwise. RPE_BENCH_B
    env overrides both. "Newer": the sweep file must postdate the
    validation log (when one exists) — a stale pre-validation sweep (run
    with different kernel gates) must not override the default."""
    import os

    env = os.environ.get("RPE_BENCH_B")
    if env:
        return int(env)
    try:
        sweep_mtime = os.path.getmtime("/tmp/bench_batch.txt")
        try:
            if sweep_mtime < os.path.getmtime(_VALIDATE_LOG):
                return BATCH
        except OSError:
            pass  # no validation log: a standalone sweep still counts
        with open("/tmp/bench_batch.txt") as f:
            b = int(f.read().strip())
        return b if 8 <= b <= 512 else BATCH
    except (OSError, ValueError):
        return BATCH


def _load_frames():
    """Real image content scaled to KITTI size (texture statistics matter)."""
    from PIL import Image

    p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
    p2 = "/root/reference/evaluation-runs/single-pair/images/000015.png"
    a = Image.open(p1).convert("L").resize((W, H), Image.BILINEAR)
    b = Image.open(p2).convert("L").resize((W, H), Image.BILINEAR)
    return np.asarray(a, np.float32), np.asarray(b, np.float32)


def _camera():
    # KITTI seq 00 intrinsics
    return np.array([[718.856, 0.0, 607.1928],
                     [0.0, 718.856, 185.2157],
                     [0.0, 0.0, 1.0]], dtype=np.float32)


def bench_tpu(img1, img2, K, cfg=None):
    import jax
    import jax.numpy as jnp

    from rpe_tpu.pipeline.estimator import estimate_sequence_batched

    if cfg is None:
        from rpe_tpu.config import EstimatorConfig

        cfg = EstimatorConfig()
    batch = _batch_from_sweep()
    if cfg is not None and cfg.feature_method.upper() == "SIFT":
        # The ORB chunk-sweep batch (up to 128) crashed the TPU worker at
        # SIFT shapes (round-4 session 2); the SIFT program is detect-bound
        # (~711 ms/frame measured, .scratch/tpu_sift_probe.py) so batch
        # amortization is negligible — pin to the probe's measured-PASS
        # config (EST8 PASS 703 ms/pair, 08-19).
        batch = min(batch, 8)
    # Sequence workload (what every dataset runner executes): BATCH
    # consecutive pairs over BATCH+1 alternating frames. Each unique frame
    # is detected once and shared by its two adjacent pairs — the reference
    # re-runs detectAndCompute on both images of every pair
    # (src/core/pose_estimator.py:497-498), which bench_opencv reproduces.
    seq = jnp.asarray(np.stack(
        [img1 if i % 2 == 0 else img2 for i in range(batch + 1)]))
    Kj = jnp.asarray(K)
    # all PRNG keys precomputed and device-resident: the timed loop issues
    # only the fused estimation program (no host-side key tracing)
    all_keys = [
        jax.device_put(jax.vmap(jax.random.PRNGKey)(
            jnp.arange(i * batch, (i + 1) * batch, dtype=jnp.uint32)))
        for i in range(ITERS)
    ]

    out = estimate_sequence_batched(seq, Kj, all_keys[0], cfg=cfg)  # compile
    np.asarray(out["R"])  # host transfer: the only reliable barrier on the
    # tunneled backend (block_until_ready returns before remote completion)

    # Sustained-throughput methodology: enqueue every iteration (async
    # dispatch), then barrier. Programs on one core execute in queue
    # order, so draining the outputs in order pays the tunnel RTT once,
    # not once per iteration — matching how the production batch loop
    # runs (pipeline/batch.py keeps a chunk in flight). Every output is
    # still transferred, so nothing is DCE'd.
    t0 = time.perf_counter()
    outs = [estimate_sequence_batched(seq, Kj, all_keys[i], cfg=cfg)
            for i in range(ITERS)]
    for o in outs:
        np.asarray(o["R"])
    dt = time.perf_counter() - t0
    return batch * ITERS / dt, outs[-1], seq


def bench_detect_stage(seq, cfg, reps=4):
    """detect-only ms/image (same barrier methodology as bench_tpu: the
    jitted program reduces to one scalar in-jit; the float() transfer is
    the only reliable barrier on the tunneled backend). One extra program
    shape (~2-4 min remote compile) — the price of an auditable stage
    split in the driver artifact (round-4 verdict item 3)."""
    import jax
    import jax.numpy as jnp

    from rpe_tpu.pipeline.estimator import detect_features

    @jax.jit
    def detect_only(imgs):
        dets = jax.lax.map(lambda im: detect_features(im, cfg), imgs)
        return sum(jnp.sum(v) for v in jax.tree.leaves(dets))

    float(detect_only(seq))  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = detect_only(seq)
        float(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1000.0 / seq.shape[0]


# v5e nominal bf16 MXU peak; the measured ceiling at real shapes on this
# chip is far lower (61 TFLOP/s at 8192^3, 16 at the matcher's shape —
# docs/PERF_LOG.md roofline), so %-of-peak here is a conservative
# LOWER bound on how much headroom remains.
_PEAK_BF16_TFLOPS = 197.0


def _stage_flops(cfg, h=H, w=W):
    """Static per-stage FLOP estimates (GFLOP) for the MFU block.

    Counts the arithmetic the TPU programs actually issue (one-hot
    selection contractions included — they are real MXU work even though
    they move no information), not textbook op counts. Formulas cite the
    op they model; constants from docs/PERF_LOG.md rooflines."""
    from rpe_tpu.ops.atlas import CAP, atlas_layout
    from rpe_tpu.ops.pyramid import level_shapes

    o = cfg.orb
    shapes = level_shapes(h, w, o.nlevels, o.scale_factor)
    _, ha, wp = atlas_layout(h, w, o.nlevels, o.scale_factor)
    # slots = NB * cap with cap interpreted PER BAND of o.band rows
    # (pooled banding, ops/atlas.banded_extract)
    cap = o.extract_cap or CAP * o.band // 8
    nb = ha // o.band
    # fused pyramid build: vertical stacked matmul + per-level horizontal
    atlas_f = (sum(lh for (lh, _) in shapes[1:]) * h * w * 2
               + sum(lh * w * lw * 2 for (lh, lw) in shapes[1:]))
    # rank kernel: ~260 VPU elementwise ops/px over the atlas (FAST-9
    # rolls + Harris) — VPU work, charged against the same peak for a
    # single conservative utilization number
    rank_f = 260 * ha * wp
    # T_BRIEF extraction: per slot 2 one-hot sampling dots (32,32)@(32,256)
    # + row-select masked slice-FMAs on (32,32) (count scales with the
    # band height: 16 at band=8) + IC moments
    slot_f = ((2 * 2 * 32 * 32 * 256)
              + 16 * (o.band // 8) * 2 * 32 * 32 + 4 * 32 * 32)
    extract_f = nb * cap * slot_f
    detect_g = (atlas_f + rank_f + extract_f) / 1e9
    # matcher: one (K,256)@(256,K) distance dot (Hamming via popcount-
    # expanded matmul) + argmin passes
    k = o.max_kpts
    match_f = 2 * k * 256 * k
    # 5pt RANSAC: hypothesis solves + Sampson scoring over all matches
    r = cfg.ransac
    m = cfg.matcher.max_matches
    pose_f = r.num_hypotheses * (20_000 + m * 60)
    mtp_g = (match_f + pose_f) / 1e9
    return {
        "detect_gflop_per_image": round(detect_g, 2),
        "extract_gflop_per_image": round(extract_f / 1e9, 2),
        "match_to_pose_gflop_per_pair": round(mtp_g, 2),
    }


def _stage_block(seq, cfg, total_ms_per_pair):
    """stages + mfu dicts for the bench JSON line (round-4 verdict #3:
    every 'at floor' claim must cite an auditable number in the bench
    artifact). detect is measured inline; extraction ms comes from the
    newest stage-probe artifact when one exists (written by
    .scratch/tpu_stage_probe.py on validation runs) because an inline
    extraction-only program would add another multi-minute remote
    compile to every driver bench run."""
    import os

    detect_ms = bench_detect_stage(seq, cfg)
    mtp_ms = max(total_ms_per_pair - detect_ms, 0.0)
    stages = {
        "total_ms_per_pair": round(total_ms_per_pair, 3),
        "detect_ms_per_image": round(detect_ms, 3),
        "match_to_pose_ms_per_pair": round(mtp_ms, 3),
        "source": "inline (detect program + headline loop)",
    }
    extract_ms = None
    try:
        with open("/tmp/stage_probe.json") as f:
            rec = json.loads(f.read().splitlines()[-1])
        extract_ms = float(rec["extract_ms_per_image"])
        stages["extract_ms_per_image"] = round(extract_ms, 3)
        stages["extract_source"] = "artifact:/tmp/stage_probe.json"
    except (OSError, KeyError, ValueError, IndexError):
        pass
    fl = _stage_flops(cfg)
    peak = _PEAK_BF16_TFLOPS

    def pct(gflop, ms):
        return (round(100.0 * (gflop / 1e3) / (peak * ms / 1e3), 2)
                if ms and ms > 0 else None)

    mfu = {
        "peak_bf16_tflops_nominal": peak,
        **fl,
        "detect_pct_peak": pct(fl["detect_gflop_per_image"], detect_ms),
        "match_to_pose_pct_peak": pct(
            fl["match_to_pose_gflop_per_pair"], mtp_ms),
        "extract_pct_peak": pct(
            fl["extract_gflop_per_image"], extract_ms),
        "note": ("extraction issues one-hot selection work at near-zero "
                 "information density; its pct_peak is the structural "
                 "headroom argument, not a target"),
    }
    return stages, mfu


def bench_opencv(img1, img2, K, reps=3):
    import cv2

    a = img1.astype(np.uint8)
    b = img2.astype(np.uint8)
    orb = cv2.ORB_create(nfeatures=4000, scaleFactor=1.1, nlevels=12,
                         fastThreshold=15, scoreType=cv2.ORB_HARRIS_SCORE)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)

    def once():
        kp1, d1 = orb.detectAndCompute(a, None)
        kp2, d2 = orb.detectAndCompute(b, None)
        ms = sorted(bf.match(d1, d2), key=lambda m: m.distance)[:500]
        p1 = np.float32([kp1[m.queryIdx].pt for m in ms])
        p2 = np.float32([kp2[m.trainIdx].pt for m in ms])
        E, _ = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC,
                                    prob=0.999, threshold=1.0)
        return cv2.recoverPose(E, p1, p2, K)

    once()  # warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        once()
    return reps / (time.perf_counter() - t0)


def bench_opencv_sift(img1, img2, K, reps=3):
    """cv2 SIFT + L2 Lowe-ratio baseline (BASELINE.json config #2; the
    reference's SIFT branch is cv2.SIFT_create() at
    src/core/pose_estimator.py:93-94)."""
    import cv2

    a = img1.astype(np.uint8)
    b = img2.astype(np.uint8)
    sift = cv2.SIFT_create(nfeatures=4000)
    bf = cv2.BFMatcher(cv2.NORM_L2)

    def once():
        kp1, d1 = sift.detectAndCompute(a, None)
        kp2, d2 = sift.detectAndCompute(b, None)
        knn = bf.knnMatch(d1, d2, k=2)
        ms = [m for m, n2 in knn if m.distance < 0.75 * n2.distance]
        ms = sorted(ms, key=lambda m: m.distance)[:500]
        p1 = np.float32([kp1[m.queryIdx].pt for m in ms])
        p2 = np.float32([kp2[m.trainIdx].pt for m in ms])
        E, _ = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC,
                                    prob=0.999, threshold=1.0)
        return cv2.recoverPose(E, p1, p2, K)

    once()  # warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        once()
    return reps / (time.perf_counter() - t0)


def _probe_backend_subprocess(timeout_s: float = 120.0) -> bool:
    """Probe jax.devices() in a FRESH subprocess.

    An in-process probe thread that wedges holds the backend-init lock for
    the life of this process — later in-process probes would then never
    succeed even after the tunnel recovers. A clean child gets a clean
    backend initialization each attempt."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(len(jax.devices()))"],
            timeout=timeout_s, capture_output=True, text=True)
        return proc.returncode == 0 and int(proc.stdout.strip() or 0) > 0
    except (subprocess.TimeoutExpired, ValueError):
        return False


_CHAIN_LOCK = "/tmp/rpe_chain_running"


def _chain_lock_fresh() -> bool:
    """True while the tunnel-recovery chain (validation / probes / golden
    regen) holds the TPU. ONE TPU process at a time (CLAUDE.md hazard #3):
    even a jax.devices() probe from here could wedge the chain's session,
    so bench must idle without probing while the lock is fresh."""
    import os

    try:
        age = time.time() - os.path.getmtime(_CHAIN_LOCK)
    except OSError:
        return False
    return age < 6 * 3600  # stale-lock guard (chain crash without cleanup)


def _wait_for_backend() -> tuple[bool, str]:
    """Bounded retry with backoff: the wedge clears after ~an hour
    (CLAUDE.md hazard #5), so probing every 5 min for RPE_BENCH_WAIT_S
    (default 75 min) trades driver wall-clock for a captured number.
    Returns (ok, reason-if-not-ok)."""
    import os

    budget = float(os.environ.get("RPE_BENCH_WAIT_S", "4500"))
    deadline = time.monotonic() + budget
    attempt = 0
    reason = "backend unresponsive (tunnel wedged) after retries"
    while True:
        attempt += 1
        if _chain_lock_fresh():
            reason = ("recovery-chain validation holds the TPU "
                      "(one process at a time); lock did not clear in time")
            left = deadline - time.monotonic()
            if left <= 0:
                return False, reason
            print(f"[bench] recovery chain holds the TPU; waiting "
                  f"(up to {left / 60:.0f} more min)", file=sys.stderr)
            time.sleep(min(120.0, left))
            continue
        if _probe_backend_subprocess():
            return True, ""
        reason = "backend unresponsive (tunnel wedged) after retries"
        left = deadline - time.monotonic()
        if left <= 0:
            return False, reason
        print(f"[bench] backend unresponsive (attempt {attempt}); retrying "
              f"for up to {left / 60:.0f} more min", file=sys.stderr)
        time.sleep(min(300.0, left))


_AUTO_BENCH = "/tmp/bench_auto.json"


def _cached_auto_result():
    """Last-resort fallback: the tunnel-recovery chain
    (.scratch/tpu_recover_chain5.sh) runs this same bench.py immediately
    after hardware validation and stores its JSON line at _AUTO_BENCH.
    That is a real measurement of the same code and configuration on this
    host's chip — if the backend cannot be reached inside the wait budget
    now, emitting that number with provenance beats emitting a null.
    Returns the parsed dict (with a numeric "value") or None."""
    import datetime
    import os

    try:
        with open(_AUTO_BENCH) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        rec = json.loads(lines[-1])
        mtime = os.path.getmtime(_AUTO_BENCH)
    except (OSError, IndexError, ValueError):
        return None
    if not isinstance(rec, dict) or not isinstance(
            rec.get("value"), (int, float)):
        return None
    rec["note"] = ("cached: measured by the tunnel-recovery chain's bench "
                   "run on this host's chip (backend unreachable at driver "
                   "bench time)")
    rec["measured_at"] = datetime.datetime.fromtimestamp(
        mtime, datetime.timezone.utc).isoformat(timespec="seconds")
    return rec


_VALIDATE_LOG = "/tmp/validate_kernels.log"
# validation-log FAILURE marker -> env gate. The validated kernels are ON
# by default in the library (ops/fast.py kernel_gate — hardware-validated
# 08-18, bit-agreement 1.00000). bench's remaining job is the PROTECTIVE
# direction: if a validation run on THIS host recorded a failure for a
# family ("<NAME> FAILED" printed by .scratch/validate_kernels_tpu.py's
# section decorator, or a CSV-A/B mismatch appended by the regen flow),
# force that family back to the XLA path before measuring.
_FAIL_MARKER_GATES = (
    ("5PT FAILED", "RPE_PALLAS_5PT"),
    ("EXTRACT FAILED", "RPE_PALLAS_EXTRACT"),
    ("MOMENTS FAILED", "RPE_EXTRACT_MOMENTS"),
    ("EXTRACT_T3 FAILED", "RPE_EXTRACT_T"),
    ("MATCH FAILED", "RPE_PALLAS_MATCH"),
    ("T_BRIEF3 FAILED", "RPE_EXTRACT_T_BRIEF"),
    # the dataset-level frame A/B ("T_BRIEF3 CSV-AB" validation section:
    # T_BRIEF vs the T path through the full match->pose on real simulator
    # frames) can fail independently of the kernel's single-image
    # bit-parity (Mosaic transcendental ULPs); its section failure line
    # "T_BRIEF3 CSV-AB FAILED" contains this marker
    ("T_BRIEF3 CSV-AB FAIL", "RPE_EXTRACT_T_BRIEF"),
    # multi-band extraction defaults to nbody=4 (validated 08-19); a
    # recorded NB failure forces the single-band fallback ("0" -> 1 in
    # ops/fast.extract_nbody)
    ("T_BRIEF3_NB4 FAILED", "RPE_EXTRACT_T_NBODY"),
    ("T_BRIEF3_NB2 FAILED", "RPE_EXTRACT_T_NBODY"),
    ("T_SPARSE FAILED", "RPE_EXTRACT_T_SPARSE"),
    ("T_QUAD FAILED", "RPE_EXTRACT_T_QUAD"),
    ("T_QUAD_NB4 FAILED", "RPE_EXTRACT_T_QUAD"),
    # band-32 production-default section (round-5 quad adoption). NOTE:
    # deliberately NOT the "T_QUAD_B32 CSV-AB" line — the quad family's
    # IC-moment reassociation can flip a BRIEF bit on a round() boundary
    # (documented contract: bit-agreement > 0.999 + pose parity within
    # RANSAC noise, NOT pose identity), so its dataset A/B gates pose
    # DELTAS; the kernel-correctness protective marker is the bit-parity
    # section below (hardware 1.00000, 08-21).
    ("T_QUAD_B32 FAILED", "RPE_EXTRACT_T_QUAD"),
)


def _disable_failed_kernels() -> list:
    """Force any Pallas kernel family whose hardware validation run on
    this host recorded a FAILURE back to the XLA path (env gate "0").
    Explicit operator-set gates win. No log, or a log with no failure
    markers, changes nothing — the library defaults (validated 08-18)
    stand. Returns the list of gates disabled."""
    import os

    try:
        with open(_VALIDATE_LOG) as f:
            log = f.read()
    except OSError:
        return []
    disabled = []
    for marker, gate in _FAIL_MARKER_GATES:
        if marker in log and os.environ.get(gate) is None:
            os.environ[gate] = "0"
            disabled.append(gate)
    # No opportunistic adoption of DEFAULT-OFF variants on PASS markers:
    # both the v4 slot diet AND the v5 occupancy-predicated sparse kernel
    # passed bit-parity but measured SLOWER than v3 in interleaved
    # one-process A/Bs (v4 ~7%, v5 ~2-3%; .scratch/tpu_v4_ab.py,
    # .scratch/tpu_sparse_ab.py, docs/PERF_LOG.md round 4). A PASS marker
    # proves correctness, never speed — adoption requires a recorded A/B.
    return disabled


def _parse_args(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--profile", default="parity",
                   help="ORB work-cut profile (config.PROFILE_NAMES); "
                        "the driver's headline run uses parity")
    p.add_argument("--sift", action="store_true",
                   help="Bench the SIFT+L2+Lowe-ratio configuration "
                        "(BASELINE.json config #2) instead of ORB+Hamming")
    return p.parse_args(argv)


def _bench_config(args):
    """(cfg, metric string, cv2-baseline fn) for the requested variant."""
    from rpe_tpu.config import EstimatorConfig, MatcherConfig, profile_config

    if args.sift:
        cfg = EstimatorConfig(
            feature_method="SIFT",
            matcher=MatcherConfig(norm_type="l2", cross_check=False))
        return (cfg, "image pairs/sec/chip (KITTI-size 1241x376, "
                "SIFT + L2 Lowe-ratio full pipeline)", bench_opencv_sift)
    cfg = profile_config(args.profile)
    name = ("ORB4000 full pipeline" if args.profile == "parity"
            else f"ORB profile {args.profile} full pipeline")
    return (cfg, f"image pairs/sec/chip (KITTI-size 1241x376, {name})",
            bench_opencv)


def main(argv=None):
    args = _parse_args(argv)
    cfg, metric, cv_fn = _bench_config(args)
    ok, reason = _wait_for_backend()
    if not ok:
        cached = _cached_auto_result() if not args.sift and \
            args.profile == "parity" else None
        if cached is not None:
            cached["reason"] = reason
            print(json.dumps(cached))
            return
        # Always emit a machine-parseable line — a null value with a reason
        # beats a nonzero exit that leaves the driver artifact unparsed.
        print(json.dumps({
            "metric": metric,
            "value": None,
            "unit": "pairs/s",
            "vs_baseline": None,
            "reason": reason,
        }))
        return
    img1, img2, K = (*_load_frames(), _camera())
    note = None
    _off = _disable_failed_kernels()
    if _off:
        note = ("validation log recorded hardware failures; disabled: "
                + ",".join(sorted(_off)))
    try:
        tpu_pps, out, seq = bench_tpu(img1, img2, K, cfg=cfg)
    except Exception as e:
        # A Mosaic rejection of a default-on kernel must not cost the
        # round's number: fall back to the pure-XLA formulation once.
        print(f"[bench] default path failed ({type(e).__name__}: {e}); "
              f"retrying with RPE_NO_PALLAS=1", file=sys.stderr)
        import os

        import jax

        os.environ["RPE_NO_PALLAS"] = "1"
        jax.clear_caches()
        tpu_pps, out, seq = bench_tpu(img1, img2, K, cfg=cfg)
        note = "RPE_NO_PALLAS fallback (default kernel path failed)"
    stages = mfu = None
    import os as _os

    if not args.sift and _os.environ.get("RPE_BENCH_STAGES") != "0":
        try:
            stages, mfu = _stage_block(seq, cfg, 1000.0 / tpu_pps)
        except Exception as e:  # stage split must never cost the number
            print(f"[bench] stage block failed: {e}", file=sys.stderr)
    try:
        # vs_baseline is always the reference's own headline configuration
        # timed on this host (cv2 at its hardcoded defaults for the same
        # feature family) — profiles are OUR knob, not the reference's.
        cv_pps = cv_fn(img1, img2, K)
    except Exception as e:  # benchmark must still emit its line
        print(f"[bench] opencv baseline failed: {e}", file=sys.stderr)
        cv_pps = float("nan")

    result = {
        "metric": metric,
        "value": round(tpu_pps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(tpu_pps / cv_pps, 3) if cv_pps == cv_pps else None,
    }
    if stages is not None:
        result["stages"] = stages
        result["mfu"] = mfu
    if note:
        result["note"] = note
    print(json.dumps(result))


if __name__ == "__main__":
    main()
