"""Standalone pose-parity probe for the adopted band-32 quad default
(the fixed T_QUAD_B32 CSV-AB gate, runnable without the full validation
chain): quad vs XLA extraction through the full match->pose program on
real sim frames; prints per-pair rotation deltas and which pairs moved.
ONE TPU process at a time — run alone.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from rpe_tpu.config import EstimatorConfig  # noqa: E402
from rpe_tpu.pipeline.estimator import (  # noqa: E402
    _match_to_pose, detect_features)

sim = "/root/reference/evaluation-runs/simulator-data/data/images"
frames = [0, 15, 30, 45, 60, 150, 165, 810, 825]
cfg = EstimatorConfig()
imgs = [np.asarray(Image.open(f"{sim}/{f:06d}.png").convert("L"),
                   np.float32) for f in frames]
seq_ab = jnp.asarray(np.stack(imgs))
Kj = jnp.asarray(np.array([[924.83, 0.0, 468.25],
                           [0.0, 920.48, 353.66],
                           [0.0, 0.0, 1.0]], np.float32))
keys = jax.vmap(jax.random.PRNGKey)(
    jnp.arange(len(frames) - 1, dtype=jnp.uint32))
print("devices:", jax.devices(), flush=True)


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


for k in ("RPE_EXTRACT_T", "RPE_EXTRACT_T_BRIEF", "RPE_EXTRACT_T_QUAD"):
    os.environ[k] = "0"
t0 = time.perf_counter()
ref = run_once()
print(f"XLA run {time.perf_counter()-t0:.0f}s", flush=True)
os.environ["RPE_EXTRACT_T"] = "1"
os.environ["RPE_EXTRACT_T_BRIEF"] = "1"
os.environ["RPE_EXTRACT_T_QUAD"] = "1"
t0 = time.perf_counter()
got = run_once()
print(f"quad run {time.perf_counter()-t0:.0f}s", flush=True)

for i in range(len(frames) - 1):
    Ra = np.asarray(got["R"][i], np.float64)
    Rb = np.asarray(ref["R"][i], np.float64)
    c = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
    d = np.degrees(np.arccos(c))
    print(f"pair {frames[i]}->{frames[i+1]}: delta {d:8.3f} deg  "
          f"inliers quad={int(got['num_inliers'][i])} "
          f"xla={int(ref['num_inliers'][i])} "
          f"valid {bool(got['valid'][i])}/{bool(ref['valid'][i])}",
          flush=True)
