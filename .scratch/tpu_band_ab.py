"""Interleaved A/B: pooled banding (round-5 extraction bet).

Variants at parity shapes on the REAL KITTI-size bench frame:
  b8c24    — current default (band=8, cap=24, nbody=4)
  b32c64   — salah-sized pooled cap (-33% slots vs b8c24)
  b32c72   — bench-shape equal-drop pooled cap (-24.6% slots)
  b32c80   — bench-shape lower-drop cap (-16% slots)
  b32c72q  — b32c72 through the v6 quad kernel (MXU row-select is
             band-invariant while v3's masked accumulate grows 4x at
             band=32 — the rejected-at-band-8 kernel may re-enter here)

Slot count = NB*cap is the measured extraction bound (~260 ns/slot,
docs/PERF_LOG.md round 4: per-slot work (v4), predication (v5), and
4-slot MXU blocks at band=8 (v6) all rejected — slot COUNT is the
remaining dial, and pooled banding buys count at equal drop).

Cross-process full_detect numbers drift ~25% run to run, so adoption
decisions need ALL variants timed in ONE process, alternating rounds.
ONE TPU process at a time — run alone.

Env-gate hazard (CLAUDE.md): kernel_gate reads are baked at first trace,
per callable — RPE_EXTRACT_T_QUAD is set just before the quad variant's
first (tracing) call and cleared before the others'.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from rpe_tpu.ops.orb import orb_detect_and_describe  # noqa: E402

H, W, F = 376, 1241, 33
NF, NL, SF, MK = 4000, 12, 1.1, 4096
# (name, band, cap, quad)
VARIANTS = (
    ("b8c24", 8, 24, False),
    ("b32c64", 32, 64, False),
    ("b32c72", 32, 72, False),
    ("b32c80", 32, 80, False),
    ("b32c72q", 32, 72, True),
)

print("devices:", jax.devices(), flush=True)
p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
img = np.asarray(Image.open(p1).convert("L").resize((W, H), Image.BILINEAR),
                 np.float32)
seq = jnp.asarray(np.stack([img] * F))

os.environ["RPE_EXTRACT_T"] = "1"
os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
os.environ["RPE_EXTRACT_T_NBODY"] = "4"   # extract_nbody clamps by band
os.environ["RPE_EXTRACT_T_BRIEF_V4"] = "0"
os.environ["RPE_EXTRACT_T_SPARSE"] = "0"

progs = {}
valid_counts = {}
for name, band, cap, quad in VARIANTS:

    @jax.jit
    def prog(ims, band=band, cap=cap):
        def one(im):
            d = orb_detect_and_describe(im, nfeatures=NF, nlevels=NL,
                                        scale_factor=SF, max_kpts=MK,
                                        extract_cap=cap, band=band)
            return (sum(jnp.sum(v) for v in jax.tree.leaves(d)),
                    jnp.sum(d["valid"]))
        s, nv = jax.lax.map(one, ims)
        return jnp.sum(s), nv[0]

    os.environ["RPE_EXTRACT_T_QUAD"] = "1" if quad else "0"
    t0 = time.perf_counter()
    try:
        s, nv = prog(seq)
        float(s)                # device->host transfer = real barrier
    except Exception as e:      # a variant's compile failure must not
        print(f"{name}: COMPILE/RUN FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        continue                # cost the other variants' numbers
    valid_counts[name] = int(nv)
    print(f"{name}: compile+run {time.perf_counter() - t0:.0f}s "
          f"valid={int(nv)}", flush=True)
    progs[name] = prog
os.environ["RPE_EXTRACT_T_QUAD"] = "0"

times = {k: [] for k in progs}
for rnd in range(6):
    for name, prog in progs.items():
        t0 = time.perf_counter()
        for _ in range(2):
            r, _ = prog(seq)
        float(r)
        times[name].append(500 * (time.perf_counter() - t0))
base = valid_counts.get("b8c24", max(valid_counts.values()))
for name, ts in times.items():
    ts = sorted(ts)
    keep = 100.0 * valid_counts[name] / max(base, 1)
    print(f"{name}: rounds(ms/call) {['%.1f' % t for t in ts]} -> "
          f"min {ts[0] / F:.3f} med {ts[len(ts) // 2] / F:.3f} ms/image "
          f"(kpts {valid_counts[name]}, {keep:.1f}% of b8c24)",
          flush=True)
