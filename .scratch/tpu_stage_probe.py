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
