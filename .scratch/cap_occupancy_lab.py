"""Measure per-band keypoint occupancy on real frames to size CAP.

The extraction slot loop costs ~260 ns/slot and slots = NB * CAP
(363 * 24 = 8712 at the KITTI bench shape) — v4/v5 showed per-slot work
cannot be cut, so the remaining lever is slot COUNT. This lab measures,
on real frames from every dataset, what fraction of VALID keypoints a
given CAP drops (pos-within-band >= CAP). First run showed sim (few
bands: small atlas) drops 7.8% at the current CAP 24 while KITTI has
363 bands for the same 4096-kpt budget — CAP should scale with
max_kpts / NB, not be a constant.

Run: python .scratch/cap_occupancy_lab.py <dataset>   (sim|salah|phone|kitti)
  [nfeatures nlevels max_kpts [bench]]  — optional profile override; the
  literal "bench" resizes frames to the 1241x376 KITTI bench shape.
"""
import functools
import glob
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from rpe_tpu.io.image_loader import load_image  # noqa: E402
from rpe_tpu.ops import orb as orb_mod  # noqa: E402
from rpe_tpu.ops.atlas import BAND, build_atlas_fused  # noqa: E402
from rpe_tpu.ops.fast import fast_score_map, harris_response_map, \
    nonmax_suppress_3x3  # noqa: E402
from rpe_tpu.ops.pyramid import level_shapes  # noqa: E402

R = 15  # PATCH // 2
NLEVELS, SCALE, NFEAT, MAXK = 12, 1.1, 4000, 4096
BENCH_RESIZE = False
if len(sys.argv) >= 5:
    NFEAT, NLEVELS, MAXK = (int(a) for a in sys.argv[2:5])
    BENCH_RESIZE = len(sys.argv) > 5 and sys.argv[5] == "bench"


@functools.partial(jax.jit, static_argnums=(1, 2))
def keypoints(img, h, w):
    """First half of orb_detect_and_describe_atlas (ops/orb.py:275-332):
    atlas -> rank map -> per-level quota approx top-k -> (xy_atlas, valid).
    Replicated here because the real function only exposes keypoints
    after banded_extract has already applied the CAP drop."""
    quotas = orb_mod.level_quotas(NFEAT, NLEVELS, SCALE)
    atlas, (offsets, total, wp) = build_atlas_fused(img, NLEVELS, SCALE)
    score = nonmax_suppress_3x3(fast_score_map(atlas, 15.0))
    rank = jnp.where(score > 0.0, harris_response_map(atlas), -jnp.inf)
    shapes = tuple(level_shapes(h, w, NLEVELS, SCALE))
    mask = orb_mod._atlas_valid_mask(tuple(offsets), total, wp, shapes,
                                     orb_mod.EDGE_MARGIN)
    rank = jnp.where(jnp.asarray(mask), rank, -jnp.inf)
    xs_a, valids = [], []
    for l, ((off, lh, lw), quota) in enumerate(zip(offsets, quotas)):
        m = orb_mod.EDGE_MARGIN
        if quota <= 0 or lh <= 2 * m or lw <= 2 * m:
            continue
        sub = jax.lax.dynamic_slice_in_dim(rank, off, lh, axis=0)
        vals, flat = jax.lax.approx_max_k(sub.reshape(-1), quota)
        vy = (flat // wp).astype(jnp.float32)
        vx = (flat % wp).astype(jnp.float32)
        valid = vals > -jnp.inf
        vy = jnp.where(valid, vy, jnp.float32(m))
        vx = jnp.where(valid, vx, jnp.float32(m))
        xs_a.append(jnp.stack([vx, vy + off], axis=-1))
        valids.append(valid)
    xy = jnp.concatenate(xs_a, axis=0)[:MAXK]
    valid = jnp.concatenate(valids, axis=0)[:MAXK]
    return xy, valid, atlas.shape[0]


DATASETS = {
    "sim": sorted(glob.glob(
        "/root/reference/evaluation-runs/simulator-data/data/images/*.png"
    ))[::60][:4],
    "salah": sorted(glob.glob(
        "/root/reference/evaluation-runs/vo_dataset_salah/data/images/*"
    ))[::60][:4],
    "phone": sorted(glob.glob(
        "/root/reference/evaluation-runs/phone-data/data/images/*"))[::4][:4],
    "kitti": sorted(glob.glob(
        "/root/reference/evaluation-runs/single-pair/images/*.png"))[:4],
}

CAPS = (8, 12, 16, 20, 24, 28, 32, 40, 48)

name = sys.argv[1]
files = DATASETS[name]
drops = {c: [] for c in CAPS}
maxcounts = []
nbs = set()
for f in files:
    img_np = load_image(f)
    if BENCH_RESIZE:
        from PIL import Image

        img_np = np.asarray(
            Image.fromarray(img_np.astype(np.uint8)).resize(
                (1241, 376), Image.BILINEAR), np.float32)
    img = jnp.asarray(img_np)
    h, w = img.shape
    xy, valid, ha = keypoints(img, h, w)
    xy, valid, ha = np.asarray(xy), np.asarray(valid), int(ha)
    nb = ha // BAND
    nbs.add(nb)
    y0 = np.clip(xy[:, 1].astype(np.int64) - R, 0, ha - 31)
    band = np.clip(y0 // BAND, 0, nb - 1)
    counts = np.bincount(band[valid], minlength=nb)
    nvalid = int(valid.sum())
    maxcounts.append(int(counts.max()))
    for c in CAPS:
        drops[c].append(int(np.maximum(counts - c, 0).sum()) / max(nvalid, 1))
line = " ".join(f"cap{c}:{100 * float(np.mean(drops[c])):.2f}%" for c in CAPS)
print(f"{name}: frames={len(files)} shape={h}x{w} NB={sorted(nbs)} "
      f"max_band_count={max(maxcounts)}\n  mean_drop {line}", flush=True)
