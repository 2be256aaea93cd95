"""Stage budget on the real TPU at bench shapes (B=32 pairs, 33 frames,
KITTI 1241x376, default config). Every variant reduces to a scalar in-jit
and is timed with a device->host transfer barrier; several reps per
variant amortize the ~28 ms tunnel dispatch floor."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from PIL import Image

from rpe_tpu.config import EstimatorConfig
from rpe_tpu.pipeline.estimator import detect_features, _match_to_pose

H, W, B = 376, 1241, 32
cfg = EstimatorConfig()

p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
p2 = "/root/reference/evaluation-runs/single-pair/images/000015.png"
a = np.asarray(Image.open(p1).convert("L").resize((W, H), Image.BILINEAR), np.float32)
b = np.asarray(Image.open(p2).convert("L").resize((W, H), Image.BILINEAR), np.float32)
seq = jnp.asarray(np.stack([a if i % 2 == 0 else b for i in range(B + 1)]))
K = jnp.asarray(np.array([[718.856, 0, 607.1928], [0, 718.856, 185.2157],
                          [0, 0, 1]], np.float32))
keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))


@jax.jit
def detect_only(imgs):
    dets = jax.lax.map(lambda im: detect_features(im, cfg), imgs)
    return sum(jnp.sum(v) for v in jax.tree.leaves(dets))


@jax.jit
def full_seq(imgs, ks):
    dets = jax.lax.map(lambda im: detect_features(im, cfg), imgs)
    d1 = jax.tree.map(lambda x: x[:-1], dets)
    d2 = jax.tree.map(lambda x: x[1:], dets)
    out = jax.vmap(lambda u, v, k: _match_to_pose(u, v, K, k, cfg))(d1, d2, ks)
    return jnp.sum(out["R"]) + jnp.sum(out["t"]) + jnp.sum(out["num_inliers"])


# precompute detections once for the match-to-pose-only variant
dets_host = None


@jax.jit
def mtp_only(d1, d2, ks):
    out = jax.vmap(lambda u, v, k: _match_to_pose(u, v, K, k, cfg))(d1, d2, ks)
    return jnp.sum(out["R"]) + jnp.sum(out["t"]) + jnp.sum(out["num_inliers"])


def timeit(name, fn, *args, reps=4):
    t0 = time.perf_counter(); float(fn(*args)); c = time.perf_counter() - t0
    print(f"{name}: compile+run {c:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        float(r)
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)
    print(f"  {name}: {1000 * best:.2f} ms/call -> {1000 * best / B:.3f} ms/pair", flush=True)
    return best


timeit("detect33", detect_only, seq)
timeit("full_seq", full_seq, seq, keys)

dets = jax.jit(lambda im: jax.lax.map(lambda x: detect_features(x, cfg), im))(seq)
d1 = jax.tree.map(lambda x: x[:-1], dets)
d2 = jax.tree.map(lambda x: x[1:], dets)
jax.block_until_ready(d1)
timeit("match_to_pose", mtp_only, d1, d2, keys)


# ---- extraction-only timer + JSON artifact for bench.py's stage block ----
# (round 5, verdict #3: the "extraction at floor" claim must cite an
# auditable number in the bench artifact). Tables come from the XLA
# fallback's exposed tbl_x0/rel_y on the real bench image; the timed
# program is extract_windows_t_brief alone at the production gates
# (nbody=4), scalar-reduced, barriered by device->host transfer.
import json, os

os.environ.setdefault("RPE_EXTRACT_T_NBODY", "4")
from rpe_tpu.ops.atlas import banded_extract, build_atlas_fused
from rpe_tpu.ops.fast_pallas import fast_harris_rank_map
from rpe_tpu.ops.orb import orb_detect_and_describe_atlas  # noqa: F401
from rpe_tpu.ops.extract_pallas import extract_windows_t_brief

_o = cfg.orb
atlas, _lay = jax.jit(lambda im: build_atlas_fused(
    im, _o.nlevels, _o.scale_factor))(jnp.asarray(a))
_rank, blurred = jax.jit(
    lambda at: fast_harris_rank_map(at, 15.0))(atlas)
# tables via the XLA fallback branch (gates forced off in a subprocess
# would be cleaner, but banded_extract exposes the tables on the XLA
# path only — emulate by calling its table build on synthetic xy from a
# quick detect)
_det = jax.jit(lambda im: orb_detect_and_describe_atlas(
    im, nfeatures=_o.nfeatures, nlevels=_o.nlevels,
    scale_factor=_o.scale_factor, max_kpts=_o.max_kpts))(jnp.asarray(a))
# rebuild slot tables exactly as banded_extract does (host-side numpy)
from rpe_tpu.ops.atlas import BAND, CAP
ha, wp = atlas.shape
xy = np.asarray(_det["xy"])  # base coords; need atlas coords — redo quick
# Use banded_extract directly with gates off via env-free helper: the
# Pallas branch is gated by _use_pallas() which is True on TPU, so spoof
# interpret=0 path by calling the internal table math ourselves.
r = 31 // 2
# fallback: time the kernel on synthetic-but-realistic tables (uniform
# x0, all slots live) — slot count is what the timer measures. Shapes
# follow the PRODUCTION config (round-5 pooled banding: band=32/cap=72
# through the quad kernel; falls back to atlas defaults if cfg carries
# none).
_band = _o.band or BAND
_cap = _o.extract_cap or CAP * _band // 8
nb = ha // _band
rng2 = np.random.default_rng(0)
tbl_x0 = rng2.integers(0, wp - 31 + 1, (nb, _cap)).astype(np.int32)
rel_y = rng2.integers(0, _band, (nb, _cap)).astype(np.int32)
tx = jnp.asarray(tbl_x0); ry = jnp.asarray(rel_y)

# 8 perturbed copies mapped in ONE program: a single-image extraction
# (~2.4 ms) would drown in the ~28 ms tunnel dispatch floor, and an
# unperturbed fori over the same input would be hoisted by XLA
EX_N = 8
pert = (jnp.arange(EX_N, dtype=jnp.float32) * 1e-3)[:, None, None]
atl8 = atlas[None] + pert
blr8 = blurred[None] + pert

from rpe_tpu.ops.fast import extract_nbody, kernel_gate

_nbody = extract_nbody(_band)
_quad = kernel_gate("RPE_EXTRACT_T_QUAD")


@jax.jit
def s_extract(a8, b8):
    def one(args):
        at, bl = args
        bits, m10, m01 = extract_windows_t_brief(
            at, bl, tx, ry, nbody=_nbody, band=_band, quad=_quad)
        return (jnp.sum(bits.astype(jnp.float32)) + jnp.sum(m10)
                + jnp.sum(m01))
    return jnp.sum(jax.lax.map(one, (a8, b8)))

ex = timeit("extract_only_x8", s_extract, atl8, blr8, reps=4) / EX_N
rec = {"extract_ms_per_image": 1000 * ex,
       "note": f"extract_windows_t_brief alone, band={_band} cap={_cap} "
               f"nbody={_nbody} quad={_quad}, all slots live "
               "(synthetic tables at production shapes)"}
with open("/tmp/stage_probe.json", "w") as f:
    f.write(json.dumps(rec) + "\n")
print("stage_probe.json:", rec, flush=True)
