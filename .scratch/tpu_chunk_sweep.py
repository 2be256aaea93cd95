"""Sequence-batch size sweep on TPU: pairs/s at B in {16, 32, 64}.
Each size is a separate program shape (2-7 min remote compile each)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from PIL import Image

from rpe_tpu.pipeline.estimator import estimate_sequence_batched

H, W = 376, 1241
p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
p2 = "/root/reference/evaluation-runs/single-pair/images/000015.png"
a = np.asarray(Image.open(p1).convert("L").resize((W, H), Image.BILINEAR), np.float32)
b = np.asarray(Image.open(p2).convert("L").resize((W, H), Image.BILINEAR), np.float32)
K = jnp.asarray(np.array([[718.856, 0, 607.1928], [0, 718.856, 185.2157],
                          [0, 0, 1]], np.float32))

results = {}
for B in (32, 64, 128):
    seq = jnp.asarray(np.stack([a if i % 2 == 0 else b for i in range(B + 1)]))
    keys = jax.device_put(jax.vmap(jax.random.PRNGKey)(
        jnp.arange(B, dtype=jnp.uint32)))
    t0 = time.perf_counter()
    out = estimate_sequence_batched(seq, K, keys)
    np.asarray(out["R"])
    print(f"B={B}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = estimate_sequence_batched(seq, K, keys)
        np.asarray(out["R"])
        best = min(best, (time.perf_counter() - t0) / 3)
    print(f"  B={B}: {1000*best:.1f} ms/call -> {1000*best/B:.3f} ms/pair "
          f"({B/best:.1f} pairs/s)", flush=True)
    results[B] = B / best

win = max(results, key=results.get)
with open("/tmp/bench_batch.txt", "w") as f:
    f.write(str(win))
print(f"winner B={win} -> /tmp/bench_batch.txt", flush=True)

# record the winner for bench.py (_batch_from_sweep)
