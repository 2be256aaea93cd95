"""Bisect the SIFT-bench TPU worker crash (round-4 session 2:
"UNAVAILABLE: TPU worker process crashed" the moment bench.py --sift ran;
suspect list: SIFT detect program size, fused Pallas ratio matcher at
SIFT shapes, HBM at B=128).

Usage: python .scratch/tpu_sift_probe.py <stage>
  detect   - jit SIFT detectAndCompute on 2 KITTI-size frames
  match    - fused Pallas ratio matcher alone at SIFT shapes (N=4000,K=128)
  matchx   - same shapes on the XLA path (RPE_PALLAS_MATCH=0)
  est8     - estimate_sequence_batched SIFT B=8, default gates
  est8x    - est8 with RPE_PALLAS_MATCH=0
  est32    - B=32 default gates

Run each stage in its OWN process (a worker crash poisons the client);
stage prints "<STAGE> PASS <ms> ms" on success.
"""
import os
import sys
import time

stage = sys.argv[1]
if stage in ("matchx", "est8x"):
    os.environ["RPE_PALLAS_MATCH"] = "0"

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("devices:", jax.devices(), flush=True)

from PIL import Image  # noqa: E402

H, W = 376, 1241
p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
p2 = "/root/reference/evaluation-runs/single-pair/images/000015.png"
img1 = np.asarray(Image.open(p1).convert("L").resize((W, H),
                                                     Image.BILINEAR),
                  np.float32)
img2 = np.asarray(Image.open(p2).convert("L").resize((W, H),
                                                     Image.BILINEAR),
                  np.float32)
K = np.array([[718.856, 0.0, 607.1928], [0.0, 718.856, 185.2157],
              [0.0, 0.0, 1.0]], np.float32)


def barrier(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


if stage == "detect":
    from rpe_tpu.ops.sift import sift_detect_and_describe

    f = jax.jit(sift_detect_and_describe)
    t0 = time.perf_counter()
    d = f(jnp.asarray(img1))
    barrier(d["xy"])
    print(f"compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for im in (img1, img2):
        d = f(jnp.asarray(im))
        barrier(d["xy"])
    ms = 500 * (time.perf_counter() - t0)
    nk = int(np.asarray(d["valid"]).sum())
    print(f"DETECT PASS {ms:.1f} ms/frame ({nk} kpts)", flush=True)
elif stage in ("match", "matchx"):
    from rpe_tpu.config import EstimatorConfig, MatcherConfig
    from rpe_tpu.pipeline.estimator import match_features

    cfg = EstimatorConfig(feature_method="SIFT",
                          matcher=MatcherConfig(norm_type="l2",
                                                cross_check=False))
    rng = np.random.default_rng(0)
    N, Kd = 4000, 128
    det = {
        "xy": jnp.asarray(rng.uniform(0, 300, (N, 2)).astype(np.float32)),
        "desc": jnp.asarray(rng.uniform(0, 0.5, (N, Kd)).astype(np.float32)),
        "valid": jnp.ones((N,), bool),
    }
    det2 = {k: v for k, v in det.items()}
    det2["desc"] = det["desc"] + 0.01
    f = jax.jit(lambda a, b: match_features(a, b, cfg))
    t0 = time.perf_counter()
    m = f(det, det2)
    barrier(m["idx1"])
    print(f"compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        m = f(det, det2)
    barrier(m["idx1"])
    ms = 100 * (time.perf_counter() - t0)
    print(f"{stage.upper()} PASS {ms:.2f} ms/pair", flush=True)
else:
    B = {"est8": 8, "est8x": 8, "est32": 32}[stage]
    from rpe_tpu.config import EstimatorConfig, MatcherConfig
    from rpe_tpu.pipeline.estimator import estimate_sequence_batched

    cfg = EstimatorConfig(feature_method="SIFT",
                          matcher=MatcherConfig(norm_type="l2",
                                                cross_check=False))
    seq = jnp.asarray(np.stack(
        [img1 if i % 2 == 0 else img2 for i in range(B + 1)]))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    t0 = time.perf_counter()
    out = estimate_sequence_batched(seq, jnp.asarray(K), keys, cfg=cfg)
    barrier(out["R"])
    print(f"compile+run {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = estimate_sequence_batched(seq, jnp.asarray(K), keys, cfg=cfg)
        barrier(out["R"])
    ms = 1000 * (time.perf_counter() - t0) / (3 * B)
    print(f"{stage.upper()} PASS {ms:.2f} ms/pair "
          f"({1000 / ms:.1f} pairs/s)", flush=True)
