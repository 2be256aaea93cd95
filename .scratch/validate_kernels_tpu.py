"""Post-wedge validation of the opt-in Pallas kernels on the real TPU,
one process, one section per kernel family.

v2 (late round 3): sections are INDEPENDENT and each prints its own
"<NAME> PASS" marker the moment its parity+timing checks clear, so a
late tunnel recovery that runs out of round budget mid-script still
leaves a usable record — bench.py adopts exactly the per-kernel gates
whose markers are on record (all-or-nothing "VALIDATION PASS" remains
as the every-kernel summary marker). Env gates are managed per section
with FRESH jax.jit wrappers (env reads bake at trace time — CLAUDE.md
perf rule; orb_detect_and_describe is not internally jitted, so a fresh
wrapper re-traces).

Do NOT export RPE_PALLAS_* into this script's environment; it sets and
clears its own gates.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Explicit "0", not pop: since the 08-18 validation the library defaults
# these gates ON on TPU (ops/fast.py kernel_gate) — an unset gate would
# make DETECT_BASE run the Pallas path and every A/B compare Pallas
# against itself.
for _g in ("RPE_PALLAS_5PT", "RPE_PALLAS_EXTRACT", "RPE_PALLAS_MATCH",
           "RPE_EXTRACT_T", "RPE_EXTRACT_T_BRIEF", "RPE_EXTRACT_MOMENTS",
           "RPE_EXTRACT_T_SPARSE", "RPE_EXTRACT_T_QUAD"):
    os.environ[_g] = "0"

# RPE_VALIDATE_SMOKE=1: tiny shapes on the CPU backend — exercises every
# section's plumbing (env dance, parity fns, timers, markers) without a
# TPU. The Pallas gates no-op on CPU, so parity checks compare XLA vs XLA
# (trivially exact); the point is that the script itself cannot rot.
SMOKE = os.environ.get("RPE_VALIDATE_SMOKE") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

print("devices:", jax.devices(), flush=True)

passed = {}

# RPE_VALIDATE_ONLY="MATCH,EXTRACT": run just those sections (for
# re-validating a fixed kernel without paying every section's remote
# compile again). APPEND the run's output to /tmp/validate_kernels.log so
# earlier markers survive — bench.py/post_validate.sh grep that one file.
ONLY = os.environ.get("RPE_VALIDATE_ONLY")
ONLY = {s.strip() for s in ONLY.split(",") if s.strip()} if ONLY else None
if ONLY and ONLY & {"EXTRACT", "MOMENTS", "EXTRACT_T3", "T_BRIEF3",
                    "T_BRIEF3_NB2", "T_BRIEF3_NB4", "T_BRIEF4",
                    "T_BRIEF4_NB4", "T_SPARSE", "T_SPARSE_NB4",
                    "T_QUAD", "T_QUAD_NB4"}:
    ONLY.add("DETECT_BASE")  # extract variants parity-check against it


def section(name):
    """Decorator: run fn, print '<NAME> PASS' on success, isolate failure."""
    def deco(fn):
        if ONLY is not None and name not in ONLY:
            print(f"{name} SKIP (RPE_VALIDATE_ONLY)", flush=True)
            return fn
        t0 = time.perf_counter()
        try:
            fn()
            passed[name] = True
            print(f"{name} PASS  [{time.perf_counter()-t0:.0f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — isolate sections
            passed[name] = False
            print(f"{name} FAILED (non-fatal): {type(e).__name__}: {e}",
                  flush=True)
        return fn
    return deco


def _best_of(fn, *args, reps=3, inner=2):
    t0 = time.perf_counter()
    float(fn(*args))
    print(f"  compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = fn(*args)
        float(r)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


rng = np.random.default_rng(0)

# ---------------- (1) 5pt kernels: accuracy drive + timing ----------------


@section("5PT")
def _five_point():
    os.environ["RPE_PALLAS_5PT"] = "1"
    try:
        from rpe_tpu.geometry.ransac import ransac_essential
        from rpe_tpu.geometry.recover_pose import recover_pose
        from rpe_tpu.geometry import so3_exp
        from rpe_tpu.geometry.five_point import five_point_essential

        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * np.deg2rad(12.0)
        R_gt = np.asarray(so3_exp(w))
        t_gt = rng.normal(size=3)
        t_gt /= np.linalg.norm(t_gt)
        N = 500
        X = rng.uniform([-2, -2, 3], [2, 2, 12], size=(N, 3))
        x1 = (X / X[:, 2:3])[:, :2]
        X2 = X @ R_gt.T + t_gt
        x2 = (X2 / X2[:, 2:3])[:, :2]
        x1 = x1 + rng.normal(scale=0.5 / 700, size=x1.shape)
        x2 = x2 + rng.normal(scale=0.5 / 700, size=x2.shape)
        x2[:N // 5] = rng.uniform(-0.5, 0.5, size=(N // 5, 2))
        valid = np.ones(N, bool)
        t0 = time.perf_counter()
        with jax.default_matmul_precision("highest"):
            r = ransac_essential(jax.random.PRNGKey(0),
                                 jnp.asarray(x1, jnp.float32),
                                 jnp.asarray(x2, jnp.float32),
                                 jnp.asarray(valid),
                                 1.0 / 700, num_hypotheses=256, solver="5pt")
            R, t, votes, _ = recover_pose(r["E"], jnp.asarray(x1, jnp.float32),
                                          jnp.asarray(x2, jnp.float32),
                                          jnp.asarray(valid),
                                          inlier_mask=r["inlier_mask"])
        R = np.asarray(R, np.float64)
        print(f"  drive compile+run {time.perf_counter()-t0:.0f}s",
              flush=True)
        rot_err = np.degrees(np.arccos(
            np.clip((np.trace(R_gt.T @ R) - 1) / 2, -1, 1)))
        print(f"  drive: ok={bool(r['ok'])} inliers={int(r['num_inliers'])} "
              f"rot_err={rot_err:.4f} deg", flush=True)
        assert bool(r["ok"]) and rot_err < 0.5

        B, H = (2, 32) if SMOKE else (32, 256)
        s1 = jnp.asarray(rng.normal(scale=0.3,
                                    size=(B, H, 5, 2)).astype(np.float32))
        s2 = jnp.asarray((np.asarray(s1)
                          + rng.normal(scale=0.02, size=(B, H, 5, 2))
                          ).astype(np.float32))

        @jax.jit
        def s_5pt(a, b):
            with jax.default_matmul_precision("highest"):
                E, ok = five_point_essential(a, b)
                return jnp.sum(E) + jnp.sum(ok)

        best = _best_of(s_5pt, s1, s2, reps=3, inner=3)
        print(f"  five_point_full fused: {1000*best:.1f} ms/call -> "
              f"{1000*best/B:.3f} ms/pair (was 2.396)", flush=True)
    finally:
        os.environ["RPE_PALLAS_5PT"] = "0"


# ------------- baseline detect (XLA extraction) for parity/timing ---------

from PIL import Image  # noqa: E402
from rpe_tpu.ops.orb import orb_detect_and_describe  # noqa: E402

Hh, Ww, F = (128, 256, 2) if SMOKE else (376, 1241, 33)
NF, NL, MK = (512, 3, 512) if SMOKE else (4000, 12, 4096)
_p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
img_a = np.asarray(
    Image.open(_p1).convert("L").resize((Ww, Hh), Image.BILINEAR),
    np.float32)
seq = jnp.asarray(np.stack([img_a] * F))
det_base = None  # XLA-extraction reference detection (set below)


def _detect_one():
    return jax.jit(lambda im: orb_detect_and_describe(
        im, nfeatures=NF, nlevels=NL, scale_factor=1.1, max_kpts=MK))(
            jnp.asarray(img_a))


def _detect_seq_timer():
    @jax.jit
    def s_detect(imgs):
        def one(im):
            d = orb_detect_and_describe(im, nfeatures=NF, nlevels=NL,
                                        scale_factor=1.1, max_kpts=MK)
            return sum(jnp.sum(v) for v in jax.tree.leaves(d))
        return jnp.sum(jax.lax.map(one, imgs))
    return s_detect


@section("DETECT_BASE")
def _detect_base():
    global det_base
    det = _detect_one()
    det_base = {k: np.asarray(v) for k, v in det.items()}
    best = _best_of(_detect_seq_timer(), seq, reps=3, inner=2)
    print(f"  full_detect XLA-extract: {1000*best:.1f} ms/call -> "
          f"{1000*best/F:.3f} ms/image (r2 budget 4.696)", flush=True)


def _bit_parity(det, label, gate=0.999):
    v, vp = det["valid"], det_base["valid"]
    assert (v == vp).all()
    assert np.array_equal(det["xy"][v], det_base["xy"][vp])
    ba = (det["bits"][v] == det_base["bits"][vp]).mean()
    print(f"  {label} bit-agreement vs XLA path: {ba:.5f}", flush=True)
    assert ba > gate


def _variant_section(name, env, kernel_fn=None):
    """kernel_fn: the ops.extract_pallas entry point this variant MUST
    trace through. The 08-18 run passed two sections vacuously (the env
    gate no-op'd and the XLA path was compared against itself), so every
    variant now spies its kernel at trace time and fails if it never
    fired. Skipped in SMOKE (gates deliberately no-op on CPU there)."""
    def run():
        assert det_base is not None, "baseline detect failed"
        import rpe_tpu.ops.extract_pallas as _ep
        calls = []
        orig = getattr(_ep, kernel_fn) if kernel_fn else None

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        for k, val in env.items():
            os.environ[k] = val
        if orig is not None:
            setattr(_ep, kernel_fn, spy)
        try:
            det = _detect_one()
            if orig is not None and not SMOKE:
                assert calls, (f"{name}: env {env} did not engage "
                               f"{kernel_fn} — vacuous validation")
            det = {k: np.asarray(v) for k, v in det.items()}
            _bit_parity(det, name)
            best = _best_of(_detect_seq_timer(), seq, reps=3, inner=2)
            print(f"  full_detect {name}: {1000*best:.1f} ms/call -> "
                  f"{1000*best/F:.3f} ms/image", flush=True)
        finally:
            if orig is not None:
                setattr(_ep, kernel_fn, orig)
            for k in env:
                # explicit "0", not pop: unset means default-ON under
                # kernel_gate, which would leak this section's gates into
                # every later section
                os.environ[k] = "0"
    run.__name__ = name
    return section(name)(run)


# ---- (2) VMEM one-hot extraction / (2b) moments / (2c) T / (2d) T_BRIEF --
# The T sections are named *3: the 08-18 run recorded "EXTRACT_T PASS" /
# "T_BRIEF PASS" markers that were VACUOUS — atlas.py's dispatch then
# required RPE_PALLAS_EXTRACT alongside RPE_EXTRACT_T, so those sections
# ran the XLA path and compared it against itself. The dispatch now honors
# RPE_EXTRACT_T standalone, and the renamed markers make sure bench.py /
# post_validate.sh can never adopt the gate off the stale vacuous lines.
_variant_section("EXTRACT", {"RPE_PALLAS_EXTRACT": "1"},
                 kernel_fn="extract_windows")
_variant_section("MOMENTS", {"RPE_PALLAS_EXTRACT": "1",
                             "RPE_EXTRACT_MOMENTS": "1"},
                 kernel_fn="extract_windows_moments")
_variant_section("EXTRACT_T3", {"RPE_EXTRACT_T": "1"},
                 kernel_fn="extract_windows_t")
# in-kernel BRIEF (normalized cos/sin, no transcendentals); still fenced
# separately — its ULP-level angle differences can flip descriptor bits
_variant_section("T_BRIEF3", {"RPE_EXTRACT_T": "1",
                              "RPE_EXTRACT_T_BRIEF": "1"},
                 kernel_fn="extract_windows_t_brief")
# nbody: multi-band transposed extraction (one VMEM transpose serves
# nbody bands — extract_pallas._t_extract_slots v2.1). Bit-identical by
# construction (CPU interpret tests at 2/4); hardware sections prove the
# Mosaic lowering agrees AND record the ms/image so bench.py can adopt
# the fastest PASS-marked value. Cleanup sets the env to "0", which
# ops/fast.extract_nbody maps back to the default 1.
_variant_section("T_BRIEF3_NB2", {"RPE_EXTRACT_T": "1",
                                  "RPE_EXTRACT_T_BRIEF": "1",
                                  "RPE_EXTRACT_T_NBODY": "2"},
                 kernel_fn="extract_windows_t_brief")
_variant_section("T_BRIEF3_NB4", {"RPE_EXTRACT_T": "1",
                                  "RPE_EXTRACT_T_BRIEF": "1",
                                  "RPE_EXTRACT_T_NBODY": "4"},
                 kernel_fn="extract_windows_t_brief")
# v4 slot diet (no blur extraction, ry folded into the sampling one-hot,
# one fused K=40 dot per slot) — bit-identical by construction (CPU
# interpret tests), hardware section proves the Mosaic lowering + ms
_variant_section("T_BRIEF4", {"RPE_EXTRACT_T": "1",
                              "RPE_EXTRACT_T_BRIEF": "1",
                              "RPE_EXTRACT_T_BRIEF_V4": "1"},
                 kernel_fn="extract_windows_t_brief")
_variant_section("T_BRIEF4_NB4", {"RPE_EXTRACT_T": "1",
                                  "RPE_EXTRACT_T_BRIEF": "1",
                                  "RPE_EXTRACT_T_BRIEF_V4": "1",
                                  "RPE_EXTRACT_T_NBODY": "4"},
                 kernel_fn="extract_windows_t_brief")
# v5 occupancy predication: every slot body under @pl.when(rel_y >= 0);
# parked slots (~53% of NB*CAP at bench shape) skip all VPU/MXU work.
# Bit-identical by construction (CPU interpret tests incl. parked slots);
# hardware sections prove the Mosaic branch lowering agrees + record ms.
_variant_section("T_SPARSE", {"RPE_EXTRACT_T": "1",
                              "RPE_EXTRACT_T_BRIEF": "1",
                              "RPE_EXTRACT_T_SPARSE": "1"},
                 kernel_fn="extract_windows_t_brief")
_variant_section("T_SPARSE_NB4", {"RPE_EXTRACT_T": "1",
                                  "RPE_EXTRACT_T_BRIEF": "1",
                                  "RPE_EXTRACT_T_SPARSE": "1",
                                  "RPE_EXTRACT_T_NBODY": "4"},
                 kernel_fn="extract_windows_t_brief")
# v6 quad (round 5): 4-slot MXU block one-hot row-select. Patch VALUES
# exact by construction; the IC moment reduction may reassociate vs the
# v3 masked-accumulate producer (interpret-mode measured 0.004% bit
# flips), so the family gate is the standard >0.999 + the CSV-AB pose
# surface. If Mosaic's reduce is producer-independent this reads 1.00000.
_variant_section("T_QUAD", {"RPE_EXTRACT_T": "1",
                            "RPE_EXTRACT_T_BRIEF": "1",
                            "RPE_EXTRACT_T_QUAD": "1"},
                 kernel_fn="extract_windows_t_brief")
_variant_section("T_QUAD_NB4", {"RPE_EXTRACT_T": "1",
                                "RPE_EXTRACT_T_BRIEF": "1",
                                "RPE_EXTRACT_T_QUAD": "1",
                                "RPE_EXTRACT_T_NBODY": "4"},
                 kernel_fn="extract_windows_t_brief")


@section("T_QUAD_B32")
def _t_quad_b32():
    """THE PRODUCTION CONFIG (round-5 adoption): band=32 / cap=72 quad
    kernel vs the XLA banded path at the SAME band/cap — bit parity +
    timing. Separate from the band-8 family sections because the
    production default now rides this exact shape (config.OrbConfig
    band=32, extract_cap=72; v3 cannot compile there — scoped VMEM)."""
    assert det_base is not None, "baseline detect failed"

    def detect_b32():
        return jax.jit(lambda im: orb_detect_and_describe(
            im, nfeatures=NF, nlevels=NL, scale_factor=1.1, max_kpts=MK,
            extract_cap=72 if not SMOKE else 24, band=32))(
                jnp.asarray(img_a))

    # XLA reference at band=32 (all kernel gates off)
    ref = {k: np.asarray(v) for k, v in detect_b32().items()}
    os.environ["RPE_EXTRACT_T"] = "1"
    os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
    os.environ["RPE_EXTRACT_T_QUAD"] = "1"
    try:
        got = {k: np.asarray(v) for k, v in detect_b32().items()}
        v, vp = got["valid"], ref["valid"]
        assert (v == vp).all()
        assert np.array_equal(got["xy"][v], ref["xy"][vp])
        ba = (got["bits"][v] == ref["bits"][vp]).mean()
        print(f"  T_QUAD_B32 bit-agreement vs XLA(band=32): {ba:.5f}",
              flush=True)
        assert ba > 0.999

        @jax.jit
        def s_detect32(imgs):
            def one(im):
                d = orb_detect_and_describe(
                    im, nfeatures=NF, nlevels=NL, scale_factor=1.1,
                    max_kpts=MK, extract_cap=72 if not SMOKE else 24,
                    band=32)
                return sum(jnp.sum(x) for x in jax.tree.leaves(d))
            return jnp.sum(jax.lax.map(one, imgs))

        best = _best_of(s_detect32, seq, reps=3, inner=2)
        print(f"  full_detect T_QUAD_B32: {1000*best:.1f} ms/call -> "
              f"{1000*best/F:.3f} ms/image (A/B 08-20: 3.459)", flush=True)
    finally:
        os.environ["RPE_EXTRACT_T"] = "0"
        os.environ["RPE_EXTRACT_T_BRIEF"] = "0"
        os.environ["RPE_EXTRACT_T_QUAD"] = "0"


@section("T_V8_B32")
def _t_v8_b32():
    """v8 (batched BRIEF sampling, opt-in RPE_EXTRACT_T_V8) at the
    band=32/cap=72 production shape vs the XLA path: bit parity + timing.
    v8 is bit-identical to quad by construction (interpret: 1.000000) —
    this proves the Mosaic lowering agrees and records the ms the
    interleaved A/B (.scratch/tpu_v8_ab.py) uses for adoption."""
    assert det_base is not None, "baseline detect failed"

    def detect_b32():
        return jax.jit(lambda im: orb_detect_and_describe(
            im, nfeatures=NF, nlevels=NL, scale_factor=1.1, max_kpts=MK,
            extract_cap=72 if not SMOKE else 24, band=32))(
                jnp.asarray(img_a))

    ref = {k: np.asarray(v) for k, v in detect_b32().items()}
    os.environ["RPE_EXTRACT_T"] = "1"
    os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
    os.environ["RPE_EXTRACT_T_V8"] = "1"
    try:
        got = {k: np.asarray(v) for k, v in detect_b32().items()}
        v, vp = got["valid"], ref["valid"]
        assert (v == vp).all()
        assert np.array_equal(got["xy"][v], ref["xy"][vp])
        ba = (got["bits"][v] == ref["bits"][vp]).mean()
        print(f"  T_V8_B32 bit-agreement vs XLA(band=32): {ba:.5f}",
              flush=True)
        assert ba > 0.999

        @jax.jit
        def s_detect32(imgs):
            def one(im):
                d = orb_detect_and_describe(
                    im, nfeatures=NF, nlevels=NL, scale_factor=1.1,
                    max_kpts=MK, extract_cap=72 if not SMOKE else 24,
                    band=32)
                return sum(jnp.sum(x) for x in jax.tree.leaves(d))
            return jnp.sum(jax.lax.map(one, imgs))

        best = _best_of(s_detect32, seq, reps=3, inner=2)
        print(f"  full_detect T_V8_B32: {1000*best:.1f} ms/call -> "
              f"{1000*best/F:.3f} ms/image", flush=True)
    finally:
        os.environ["RPE_EXTRACT_T"] = "0"
        os.environ["RPE_EXTRACT_T_BRIEF"] = "0"
        os.environ["RPE_EXTRACT_T_V8"] = "0"


@section("T_QUAD_B32 CSV-AB")
def _t_quad_b32_csv_ab():
    """Dataset-level A/B at the PRODUCTION config (EstimatorConfig()
    defaults: band=32/cap=72): quad kernel vs the XLA extraction through
    the full match->pose program on real simulator frames — poses must be
    bit-identical (the quad family's selection values are exact). Failure
    line contains the "T_QUAD_B32 CSV-AB FAIL" marker bench.py greps."""
    import dataclasses

    from rpe_tpu.config import EstimatorConfig, OrbConfig
    from rpe_tpu.pipeline.estimator import _match_to_pose, detect_features

    sim = "/root/reference/evaluation-runs/simulator-data/data/images"
    frames = [0, 15, 30, 45, 60, 150, 165, 810, 825]
    cfg = EstimatorConfig()
    if SMOKE:
        frames = frames[:3]
        cfg = dataclasses.replace(
            cfg, orb=OrbConfig(nfeatures=512, nlevels=3, max_kpts=512,
                               band=32, extract_cap=24))
    imgs = []
    for f in frames:
        im = Image.open(f"{sim}/{f:06d}.png").convert("L")
        if SMOKE:
            im = im.resize((256, 128), Image.BILINEAR)
        imgs.append(np.asarray(im, np.float32))
    seq_ab = jnp.asarray(np.stack(imgs))
    Kj = jnp.asarray(np.array([[924.83, 0.0, 468.25],
                               [0.0, 920.48, 353.66],
                               [0.0, 0.0, 1.0]], np.float32))
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(len(frames) - 1, dtype=jnp.uint32))

    def run_once():
        @jax.jit
        def prog(ims, K, ks):
            dets = jax.lax.map(lambda im: detect_features(im, cfg), ims)
            d1 = jax.tree.map(lambda x: x[:-1], dets)
            d2 = jax.tree.map(lambda x: x[1:], dets)
            return jax.vmap(
                lambda a, b, k: _match_to_pose(a, b, K, k, cfg))(d1, d2, ks)
        out = prog(seq_ab, Kj, keys)
        return {k: np.asarray(v) for k, v in out.items()
                if k in ("R", "t", "valid", "num_inliers")}

    ref = run_once()              # all gates "0" -> XLA extraction
    os.environ["RPE_EXTRACT_T"] = "1"
    os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
    os.environ["RPE_EXTRACT_T_QUAD"] = "1"
    try:
        t0 = time.perf_counter()
        got = run_once()
        print(f"  quad-b32 run {time.perf_counter()-t0:.0f}s", flush=True)
    finally:
        os.environ["RPE_EXTRACT_T"] = "0"
        os.environ["RPE_EXTRACT_T_BRIEF"] = "0"
        os.environ["RPE_EXTRACT_T_QUAD"] = "0"
    # POSE-PARITY gate, not identity: the quad family's IC-moment
    # reduction reassociates vs the XLA path (documented contract:
    # bit-agreement > 0.999; a flipped BRIEF bit on a round() boundary
    # perturbs the match set like a reseed). Gate: valid flags equal,
    # and per-pair rotation delta small on well-conditioned CONSECUTIVE
    # pairs; the jump pairs (60->150, 165->810) and the ambiguous
    # 150->165 valley (PERF_LOG round 4) may legitimately land in a
    # different RANSAC basin — for those only both-valid is required.
    np.testing.assert_array_equal(got["valid"], ref["valid"], "valid")
    f1s = frames[:-1]
    deltas = []
    for i in range(len(f1s)):
        Ra = np.asarray(got["R"][i], np.float64)
        Rb = np.asarray(ref["R"][i], np.float64)
        c = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
        deltas.append(np.degrees(np.arccos(c)))
    well = [d for i, d in enumerate(deltas)
            if (frames[i + 1] - frames[i]) == 15 and frames[i] != 150]
    print(f"  pose deltas (deg): "
          f"{['%.2f' % d for d in deltas]} (gated: consecutive pairs)",
          flush=True)
    assert max(well) < 2.0, f"non-ambiguous pose delta too large: {well}"
    print(f"  T_QUAD(band32) pose-parity over {len(f1s)} real sim pairs "
          f"OK (max consecutive-pair delta {max(well):.3f} deg)",
          flush=True)


@section("T_BRIEF3 CSV-AB")
def _t_brief_csv_ab():
    """Dataset-level A/B: T_BRIEF vs the T path through the FULL
    match->pose program on real simulator frames — the ULP-sensitive
    surface a single synthetic image can miss. On failure the section
    line reads "T_BRIEF3 CSV-AB FAILED", which contains the
    "T_BRIEF3 CSV-AB FAIL" disable marker bench.py/post_validate.sh
    grep for (previously nothing emitted the FAIL side — ADVICE r3)."""
    import dataclasses

    from rpe_tpu.config import EstimatorConfig, OrbConfig
    from rpe_tpu.pipeline.estimator import _match_to_pose, detect_features

    sim = "/root/reference/evaluation-runs/simulator-data/data/images"
    frames = [0, 15, 30, 45, 60, 150, 165, 810, 825]
    # pinned to the band-8 family shape (config defaults moved to band=32
    # in round 5 — that production surface has its own T_QUAD_B32 CSV-AB
    # section; the v3 T_BRIEF kernel cannot compile at band=32/cap>=72)
    cfg = dataclasses.replace(
        EstimatorConfig(),
        orb=OrbConfig(band=8, extract_cap=24))
    if SMOKE:
        frames = frames[:3]
        cfg = dataclasses.replace(
            cfg, orb=OrbConfig(nfeatures=512, nlevels=3, max_kpts=512,
                               band=8, extract_cap=24))
    imgs = []
    for f in frames:
        im = Image.open(f"{sim}/{f:06d}.png").convert("L")
        if SMOKE:
            im = im.resize((256, 128), Image.BILINEAR)
        imgs.append(np.asarray(im, np.float32))
    seq_ab = jnp.asarray(np.stack(imgs))
    Kj = jnp.asarray(np.array([[924.83, 0.0, 468.25],
                               [0.0, 920.48, 353.66],
                               [0.0, 0.0, 1.0]], np.float32))
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(len(frames) - 1, dtype=jnp.uint32))

    def run_once():
        # fresh local fn each call: jax's jit cache is keyed by the
        # underlying callable, so reusing one jitted program would bake
        # the FIRST run's env gates into both sides (CLAUDE.md perf rule)
        @jax.jit
        def prog(ims, K, ks):
            dets = jax.lax.map(lambda im: detect_features(im, cfg), ims)
            d1 = jax.tree.map(lambda x: x[:-1], dets)
            d2 = jax.tree.map(lambda x: x[1:], dets)
            return jax.vmap(
                lambda a, b, k: _match_to_pose(a, b, K, k, cfg))(d1, d2, ks)
        out = prog(seq_ab, Kj, keys)
        return {k: np.asarray(v) for k, v in out.items()
                if k in ("R", "t", "valid", "num_inliers")}

    os.environ["RPE_EXTRACT_T"] = "1"
    os.environ["RPE_EXTRACT_T_BRIEF"] = "0"
    try:
        t0 = time.perf_counter()
        ref = run_once()
        print(f"  T-path run {time.perf_counter()-t0:.0f}s", flush=True)
        os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
        t0 = time.perf_counter()
        got = run_once()
        print(f"  T_BRIEF run {time.perf_counter()-t0:.0f}s", flush=True)
    finally:
        os.environ["RPE_EXTRACT_T"] = "0"
        os.environ["RPE_EXTRACT_T_BRIEF"] = "0"
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k], k)
    print(f"  T_BRIEF == T over {len(frames)-1} real sim pairs "
          f"(R/t/valid/num_inliers bit-identical)", flush=True)


# ---------------- (3) fused matcher: bit-parity + timing -------------------


@section("MATCH")
def _match():
    os.environ["RPE_PALLAS_MATCH"] = "1"
    try:
        from rpe_tpu.ops.match import (cross_check_match,
                                       hamming_distance_matrix,
                                       l2sq_distance_matrix)
        from rpe_tpu.ops.match_pallas import cross_check_match_fused

        NK = 512 if SMOKE else 4096
        bits1 = jnp.asarray((rng.random((NK, 256)) < 0.5).astype(np.uint8))
        bits2 = jnp.asarray((rng.random((NK, 256)) < 0.5).astype(np.uint8))
        v1 = jnp.asarray(np.arange(NK) < NK - 300)
        v2 = jnp.asarray(np.arange(NK) < NK - 200)

        ref = cross_check_match(hamming_distance_matrix(bits1, bits2), v1, v2,
                                max_matches=512)
        t0 = time.perf_counter()
        got = cross_check_match_fused(bits1, bits2, v1, v2,
                                      max_matches=512,
                                      interpret=SMOKE)
        mm = {k: np.asarray(vv) for k, vv in got.items()}
        print(f"  match compile+run {time.perf_counter()-t0:.0f}s",
              flush=True)
        for k in ("idx1", "idx2", "dist", "valid"):
            np.testing.assert_array_equal(mm[k], np.asarray(ref[k]), k)
        print(f"  fused matcher bit-parity OK "
              f"({int(mm['valid'].sum())} matches)", flush=True)

        dl1 = jnp.asarray(rng.normal(size=(NK, 128)).astype(np.float32))
        dl2 = jnp.asarray(rng.normal(size=(NK, 128)).astype(np.float32))
        refl = cross_check_match(l2sq_distance_matrix(dl1, dl2), v1, v2,
                                 max_matches=512)
        gotl = cross_check_match_fused(dl1, dl2, v1, v2, max_matches=512,
                                       norm="l2", interpret=SMOKE)
        mref = np.asarray(refl["valid"])
        rs = set(zip(np.asarray(refl["idx1"])[mref],
                     np.asarray(refl["idx2"])[mref]))
        gs = set(zip(np.asarray(gotl["idx1"])[mref],
                     np.asarray(gotl["idx2"])[mref]))
        inter = len(rs & gs) / max(len(rs), 1)
        print(f"  fused matcher L2 set-parity {inter:.4f} "
              f"({len(rs)} matches)", flush=True)
        assert inter > 0.999

        # vmapped parity (batching rule + Mosaic) and timing vs XLA
        BM = 2 if SMOKE else 24
        bb1 = jnp.asarray((rng.random((BM, NK, 256)) < 0.5)
                          .astype(np.uint8))
        bb2 = jnp.asarray((rng.random((BM, NK, 256)) < 0.5)
                          .astype(np.uint8))
        vm_fused = jax.vmap(lambda c1, c2: cross_check_match_fused(
            c1, c2, v1, v2, max_matches=512, interpret=SMOKE))
        gv = {k: np.asarray(vv)
              for k, vv in vm_fused(bb1[:2], bb2[:2]).items()}
        for j in range(2):
            refj = cross_check_match(hamming_distance_matrix(bb1[j], bb2[j]),
                                     v1, v2, max_matches=512)
            for k in ("idx1", "idx2", "dist", "valid"):
                np.testing.assert_array_equal(gv[k][j], np.asarray(refj[k]),
                                              f"vmap {k}")
        print("  fused matcher vmapped bit-parity OK", flush=True)

        @jax.jit
        def s_match(c1, c2):
            m = vm_fused(c1, c2)
            return (jnp.sum(m["dist"] * m["valid"])
                    + jnp.sum(m["idx1"] + m["idx2"]).astype(jnp.float32))

        @jax.jit
        def s_match_xla(c1, c2):
            def one(t):
                m = cross_check_match(hamming_distance_matrix(t[0], t[1]),
                                      v1, v2, max_matches=512)
                return (jnp.sum(m["dist"] * m["valid"])
                        + jnp.sum(m["idx1"] + m["idx2"]).astype(jnp.float32))
            return jnp.sum(jax.lax.map(one, (c1, c2)))

        for name, fn in (("fused", s_match), ("xla", s_match_xla)):
            best = _best_of(fn, bb1, bb2, reps=3, inner=2)
            print(f"  match[{name}]: {1000*best:.1f} ms/call -> "
                  f"{1000*best/BM:.3f} ms/pair (xla budget 0.66)",
                  flush=True)
    finally:
        # explicit "0", not pop: unset means default-ON under kernel_gate
        os.environ["RPE_PALLAS_MATCH"] = "0"


# ------------- (5) device-resident VP voting vs the host twin -------------


@section("VP_DEVICE")
def _vp_device():
    """Gate-statistics agreement of manhattan_dirs_for_frames_device vs
    the host twin on REAL phone frames (the dataset family where VP
    refinement actually fires — reference pose_estimator.py:536-567),
    plus the device path's ms/frame. PASS contract: the reliability gate
    (ok & acc_max >= acc_min & vp2_score >= vp2_min) decides identically
    on every tested frame, and on reliable frames the voted directions
    agree to < 2 deg per axis (sampling-regime voting differs by design —
    PARITY.md VP device row — but must not move the decisions)."""
    import glob

    import cv2

    from rpe_tpu.config import VpConfig
    from rpe_tpu.geometry.vp_refine import (
        manhattan_dirs_for_frames,
        manhattan_dirs_for_frames_device,
    )

    if SMOKE:
        F_vp, hw = 2, (120, 160)
        frames = np.stack([
            (rng.uniform(0, 255, hw) * 0).astype(np.float32) + 30
            for _ in range(F_vp)])
        for f in range(F_vp):
            cv2.line(frames[f], (10, 10), (150, 60), 225, 3)
        Kvp = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]],
                       np.float32)
    else:
        paths = sorted(glob.glob(
            "/root/reference/evaluation-runs/phone-data/data/images/"
            "*.png"))[:8]
        frames = np.stack([
            cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32)
            for p in paths])
        Kvp = np.load(
            "/root/reference/evaluation-runs/phone-data/data/"
            "calibration_scaled.npz")["K"].astype(np.float32)
    cfg = VpConfig(enabled=True)

    t0 = time.perf_counter()
    host = manhattan_dirs_for_frames(frames, Kvp, cfg)
    t_host = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev = manhattan_dirs_for_frames_device(frames, Kvp, cfg)
    t_comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev = manhattan_dirs_for_frames_device(frames, Kvp, cfg)
    t_dev = time.perf_counter() - t0
    nfr = frames.shape[0]
    print(f"  host {1000*t_host/nfr:.1f} ms/frame, device "
          f"{1000*t_dev/nfr:.1f} ms/frame (compile+run "
          f"{t_comp:.0f}s)", flush=True)

    def reliable(entry):
        _, ok, dbg = entry
        return (ok and dbg.get("acc_max", 0.0) >= cfg.acc_min
                and dbg.get("vp2_score", 0.0) >= cfg.vp2_min)

    n_rel = 0
    for f in range(nfr):
        rh, rd = reliable(host[f]), reliable(dev[f])
        print(f"  frame {f}: host ok={host[f][1]} "
              f"acc={host[f][2].get('acc_max', 0):.3g} "
              f"vp2={host[f][2].get('vp2_score', 0):.3g} | device "
              f"ok={dev[f][1]} acc={dev[f][2]['acc_max']:.3g} "
              f"vp2={dev[f][2]['vp2_score']:.3g}", flush=True)
        assert rh == rd, f"frame {f}: gate decision differs"
        if rh and rd:
            n_rel += 1
            Dh, Dd = host[f][0], dev[f][0]
            for ax in range(3):
                best = max(abs(float(Dh[:, ax] @ Dd[:, j]))
                           for j in range(3))
                ang = np.degrees(np.arccos(min(1.0, best)))
                assert ang < 2.0, f"frame {f} axis {ax}: {ang:.2f} deg"
    print(f"  gate decisions agree on {nfr}/{nfr} frames "
          f"({n_rel} reliable)", flush=True)


CORE = ("5PT", "EXTRACT", "EXTRACT_T3", "MATCH")
if all(passed.get(k) for k in CORE):
    print("VALIDATION PASS", flush=True)
else:
    print("VALIDATION PARTIAL:",
          {k: v for k, v in passed.items()}, flush=True)
