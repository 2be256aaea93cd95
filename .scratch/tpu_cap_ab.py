"""Interleaved A/B: extraction cap 24 (default) vs 20 vs 16 at nbody=4,
parity shapes, REAL KITTI-size image. Slot count = NB*cap is the measured
extraction bound (~260 ns/slot, docs/PERF_LOG.md round 4: per-slot work
(v4) and predication (v5) both rejected — cap is the remaining lever).

Cross-process full_detect numbers drift ~25% run to run, so adoption
decisions need ALL variants timed in ONE process, alternating rounds.
ONE TPU process at a time — run alone.

Also prints the parity-vs-cap24 keypoint retention on this frame so the
throughput number is read next to its cost.
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
CAPS = (24, 20, 16)

print("devices:", jax.devices(), flush=True)
p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
img = np.asarray(Image.open(p1).convert("L").resize((W, H), Image.BILINEAR),
                 np.float32)
seq = jnp.asarray(np.stack([img] * F))

os.environ["RPE_EXTRACT_T"] = "1"
os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
os.environ["RPE_EXTRACT_T_NBODY"] = "4"
os.environ["RPE_EXTRACT_T_BRIEF_V4"] = "0"
os.environ["RPE_EXTRACT_T_SPARSE"] = "0"

progs = {}
valid_counts = {}
for cap in CAPS:
    name = f"cap{cap}"

    @jax.jit
    def prog(ims, cap=cap):
        def one(im):
            d = orb_detect_and_describe(im, nfeatures=NF, nlevels=NL,
                                        scale_factor=SF, max_kpts=MK,
                                        extract_cap=cap)
            return (sum(jnp.sum(v) for v in jax.tree.leaves(d)),
                    jnp.sum(d["valid"]))
        s, nv = jax.lax.map(one, ims)
        return jnp.sum(s), nv[0]

    t0 = time.perf_counter()
    s, nv = prog(seq)
    float(s)                    # device->host transfer = real barrier
    valid_counts[name] = int(nv)
    print(f"{name}: compile+run {time.perf_counter() - t0:.0f}s "
          f"valid={int(nv)}", flush=True)
    progs[name] = prog

times = {k: [] for k in progs}
for rnd in range(6):
    for name, prog in progs.items():
        t0 = time.perf_counter()
        for _ in range(2):
            r, _ = prog(seq)
        float(r)
        times[name].append(500 * (time.perf_counter() - t0))
base = valid_counts["cap24"]
for name, ts in times.items():
    ts = sorted(ts)
    keep = 100.0 * valid_counts[name] / max(base, 1)
    print(f"{name}: rounds(ms/call) {['%.1f' % t for t in ts]} -> "
          f"min {ts[0] / F:.3f} med {ts[len(ts) // 2] / F:.3f} ms/image "
          f"(kpts {valid_counts[name]}, {keep:.1f}% of cap24)",
          flush=True)
