"""Hardware A/B: RPE_ONEHOT_BF16 on the XLA extraction path.

Run with RPE_NO_PALLAS=1 (the flag only matters when the Pallas extraction
is off — it halves the ~1.4 GB/image one-hot operand traffic IF XLA:TPU
keeps the buffer bf16). Values are BIT-IDENTICAL either way (tested);
this probe only answers the perf question. ONE TPU process at a time.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
assert os.environ.get("RPE_NO_PALLAS"), "run with RPE_NO_PALLAS=1"

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from rpe_tpu.ops.orb import orb_detect_and_describe

Hh, Ww, F = 376, 1241, 33
p1 = "/root/reference/evaluation-runs/single-pair/images/000000.png"
a = np.asarray(Image.open(p1).convert("L").resize((Ww, Hh), Image.BILINEAR),
               np.float32)
seq = jnp.asarray(np.stack([a] * F))

for flag in ("", "1"):
    if flag:
        os.environ["RPE_ONEHOT_BF16"] = flag
    else:
        os.environ.pop("RPE_ONEHOT_BF16", None)

    @jax.jit
    def s_detect(imgs):
        def one(im):
            d = orb_detect_and_describe(im, nfeatures=4000, nlevels=12,
                                        scale_factor=1.1, max_kpts=4096)
            return sum(jnp.sum(v) for v in jax.tree.leaves(d))
        return jnp.sum(jax.lax.map(one, imgs))

    t0 = time.perf_counter(); float(s_detect(seq))
    print(f"bf16={bool(flag)} compile+run {time.perf_counter()-t0:.0f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            rr = s_detect(seq)
        float(rr)
        best = min(best, (time.perf_counter() - t0) / 2)
    print(f"xla_detect onehot_bf16={bool(flag)}: {1000*best:.1f} ms/call -> "
          f"{1000*best/F:.3f} ms/image", flush=True)
