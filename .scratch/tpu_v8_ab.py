"""Interleaved v8 A/B: quad vs v8 (batched BRIEF sampling) at the adopted
band=32/cap=72 production config, plus the b8c24 anchor (round-5
session 2). v8 is BIT-IDENTICAL to quad (interpret: 1.000000 both bands,
moments exactly equal), so adoption on a win is a gate flip + focused
hardware bit-parity — no golden implications. ONE TPU process at a time.
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
# (name, band, cap, mode)
VARIANTS = (
    ("b32c72q", 32, 72, "quad"),
    ("b32c72v8", 32, 72, "v8"),
    ("b32c64v8", 32, 64, "v8"),
    ("b8c24v8", 8, 24, "v8"),
)

print("devices:", jax.devices(), flush=True)
p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
img = np.asarray(Image.open(p1).convert("L").resize((W, H), Image.BILINEAR),
                 np.float32)
seq = jnp.asarray(np.stack([img] * F))

os.environ["RPE_EXTRACT_T"] = "1"
os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
os.environ["RPE_EXTRACT_T_NBODY"] = "4"

progs = {}
valid_counts = {}
for name, band, cap, mode in VARIANTS:

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

    os.environ["RPE_EXTRACT_T_QUAD"] = "1" if mode == "quad" else "0"
    os.environ["RPE_EXTRACT_T_V8"] = "1" if mode == "v8" else "0"
    t0 = time.perf_counter()
    try:
        s, nv = prog(seq)
        float(s)
    except Exception as e:
        print(f"{name}: COMPILE/RUN FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        continue
    valid_counts[name] = int(nv)
    print(f"{name}: compile+run {time.perf_counter() - t0:.0f}s "
          f"valid={int(nv)}", flush=True)
    progs[name] = prog
os.environ["RPE_EXTRACT_T_QUAD"] = "0"
os.environ["RPE_EXTRACT_T_V8"] = "0"

times = {k: [] for k in progs}
for rnd in range(6):
    for name, prog in progs.items():
        t0 = time.perf_counter()
        for _ in range(2):
            r, _ = prog(seq)
        float(r)
        times[name].append(500 * (time.perf_counter() - t0))
for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: rounds(ms/call) {['%.1f' % t for t in ts]} -> "
          f"min {ts[0] / F:.3f} med {ts[len(ts) // 2] / F:.3f} ms/image "
          f"(kpts {valid_counts[name]})", flush=True)
