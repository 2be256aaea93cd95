"""Batched sequence processing over image pairs (reference:
src/core/batch_processor.py).

The reference walks consecutive frame pairs in a sequential Python loop,
re-anchoring each pair to the ground-truth orientation of its first frame
(batch_processor.py:71-109) — pairs are therefore independent, and the loop
becomes a *batch axis*: images are stacked once, pairs are estimated in
device-resident chunks via a vmapped fused estimator, and (optionally)
sharded across a 1-D device mesh (SURVEY.md §2.3, pair-level DP).

Semantics preserved exactly: GT anchoring (R_prev from GT of frame1), world
composition R_new = R_prev @ R_rel, Euler conversion per the configured
convention, identical result-dict schema. Failure semantics are *stronger*
than the reference: a degenerate pair yields valid=False + identity relative
rotation instead of aborting the run (SURVEY.md §5, failure-detection row);
pass strict=True for reference-style RuntimeError.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import euler_to_rotation, rotation_to_euler
from ..io.image_loader import LazyFrameSource
from .estimator import estimate_sequence_batched


def _sequence_blocks(sel1, local, n_dev, last_frame_pos):
    """Per-device consecutive frame blocks for a padded pair chunk.

    sel1: chunk pair-start frame indices (padding repeats the last real
      index). Device d covers pairs [d*local, (d+1)*local): its block is
      local+1 consecutive frame positions starting at its FIRST pair's
      start frame, so a chunk stages chunk + n_dev frame slots instead of
      the 2*chunk the replicated-pairs layout cost.

    Each block is rebuilt consecutively from sel1[d*local] rather than
    copied element-wise from sel1: real pairs form a consecutive prefix of
    the chunk, so this keeps every real pair p at flat slot p computing
    (sel1[p], sel1[p]+1) even in a padded chunk. (Copying sel1 verbatim
    put the repeated-pad indices INSIDE the boundary device's block and
    shifted its real pairs onto same-frame degenerate slots — the last
    real pair of almost every mesh run's final chunk came back invalid.)
    Positions are clamped to last_frame_pos, so pad slots beyond the
    sequence become same-frame pairs — discarded by the caller.

    Returns (n_dev, local+1) int array of frame positions.
    """
    blocks = np.empty((n_dev, local + 1), dtype=np.int64)
    for d in range(n_dev):
        s = sel1[d * local]
        for j in range(local + 1):
            blocks[d, j] = min(s + j, last_frame_pos)
    return blocks


class BatchProcessor:
    """Sequence-pair trajectory processor (API mirror of the reference).

    Extra knobs vs the reference:
      chunk: static pairs-per-dispatch (compiled once, reused; pad last).
      mesh:  optional jax.sharding.Mesh with a 'pairs' axis to shard chunks
             across devices.
      strict: reference-style abort on any failed pair.
    """

    def __init__(self, images_dir, pose_estimator, ground_truth_loader,
                 euler_convention: str = "yup", chunk: int = 8,
                 mesh=None, strict: bool = False, seed: int = 0,
                 checkpoint_path=None, checkpoint_salt: str = ""):
        self.images_dir = Path(images_dir)
        self.pose_estimator = pose_estimator
        self.gt_loader = ground_truth_loader
        self.euler_convention = euler_convention
        self.chunk = chunk
        self.mesh = mesh
        self.strict = strict
        self.seed = seed
        # Chunked checkpoint/resume (SURVEY.md §5 checkpoint row): per-pair
        # results appended as jsonl after every chunk; a restarted run skips
        # already-computed pairs. The reference recomputes everything.
        self.checkpoint_path = Path(checkpoint_path) if checkpoint_path else None
        # Extra identity for the checkpoint hash. Callers that remap frame
        # ids to positions 0..N-1 (cli/run_kitti_sequence.py) MUST pass the
        # dataset identity here: with positional frames, the per-record
        # frame ids match trivially across different --step/--images-dir
        # slices, so only the header hash protects against silently
        # resuming poses computed on different image pairs.
        self.checkpoint_salt = checkpoint_salt

    def get_image_path(self, frame_idx):
        """{idx:06d}.png path (reference batch_processor.py:131-141)."""
        return self.images_dir / f"{frame_idx:06d}.png"

    def _config_hash(self) -> str:
        """Hash of everything that determines per-pair results: estimator
        config (solver, nfeatures, thresholds, ...), K, seed, convention.
        Stored in the checkpoint header so a stale checkpoint written under
        a different configuration at the same path is never reused."""
        import hashlib

        K = np.asarray(self.pose_estimator.K, dtype=np.float64)
        payload = (f"{self.pose_estimator.config!r}|{K.tobytes().hex()}|"
                   f"{self.seed}|{self.euler_convention}|"
                   f"{self.checkpoint_salt}")
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def _estimate_all_pairs(self, frames, imgs):
        """Estimate every consecutive pair; returns per-pair arrays."""
        n_pairs = len(frames) - 1

        K = jnp.asarray(self.pose_estimator.K, dtype=jnp.float32)
        cfg = self.pose_estimator.config
        chunk = min(self.chunk, n_pairs)
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            chunk = max(chunk // n_dev, 1) * n_dev

        shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P("pairs"))

        R_out = np.zeros((n_pairs, 3, 3), dtype=np.float64)
        t_out = np.zeros((n_pairs, 3), dtype=np.float64)
        valid_out = np.zeros((n_pairs,), dtype=bool)
        nm_out = np.zeros((n_pairs,), dtype=np.int64)
        ni_out = np.zeros((n_pairs,), dtype=np.int64)

        done = self._load_checkpoint(frames, R_out, t_out, valid_out,
                                     nm_out, ni_out)

        from ..utils.observability import ThroughputMeter

        n_chips = self.mesh.devices.size if self.mesh is not None else 1
        meter = ThroughputMeter(n_chips=n_chips)
        meter.start()
        def _stage(start):
            """Build one chunk's device inputs; transfers are enqueued
            asynchronously so staging chunk c+1 overlaps chunk c's compute
            (double buffering — H2D is the slow path on tunneled hosts)."""
            end = min(start + chunk, n_pairs)
            idx = list(range(start, end))
            pad = chunk - len(idx)
            sel1 = idx + [idx[-1]] * pad
            keys = jax.vmap(jax.random.PRNGKey)(
                jnp.asarray([self.seed + s for s in sel1], dtype=jnp.uint32))
            if shard is None:
                # Consecutive pairs share frames: detect each unique frame
                # once per chunk (estimator.estimate_sequence_batched). The
                # padded tail repeats the last frame (same-frame pairs are
                # discarded below).
                fsel = list(range(start, end + 1)) + [end] * pad
                arrs = (jnp.asarray(imgs[fsel]), K, keys)
            else:
                # Mesh path: shard contiguous per-device frame blocks so
                # each device detects its local frames ONCE and shares
                # detections between adjacent pairs — the single-chip
                # sequence-batching win (~1.6x) carried onto the mesh.
                n_dev = self.mesh.devices.size
                local = chunk // n_dev
                blocks = _sequence_blocks(sel1, local, n_dev, n_pairs)
                fblk = jnp.asarray(imgs[blocks])      # (n_dev, local+1, H, W)
                kblk = jnp.asarray(keys).reshape(n_dev, local, -1)
                arrs = (jax.device_put(fblk, shard), K,
                        jax.device_put(kblk, shard))
            return start, end, arrs

        starts = [s for s in range(0, n_pairs, chunk)
                  if not all(i in done
                             for i in range(s, min(s + chunk, n_pairs)))]

        def _compute(arrs):
            """Enqueue one chunk's program (async dispatch)."""
            if shard is None:
                return estimate_sequence_batched(*arrs, cfg=cfg)
            from ..parallel.sharded_estimator import (
                estimate_sequence_sharded,
            )

            out = estimate_sequence_sharded(*arrs, cfg=cfg, mesh=self.mesh)
            return jax.tree.map(
                lambda x: x.reshape(chunk, *x.shape[2:]), out)

        def _flush(entry):
            """Block on a chunk's outputs and record them (device->host
            transfer is the only reliable barrier on the tunneled
            backend)."""
            start, end, out = entry
            n = end - start
            R_out[start:end] = np.asarray(out["R"])[:n]
            t_out[start:end] = np.asarray(out["t"])[:n]
            valid_out[start:end] = np.asarray(out["valid"])[:n]
            nm_out[start:end] = np.asarray(out["num_matches"])[:n]
            ni_out[start:end] = np.asarray(out["num_inliers"])[:n]
            meter.lap(pairs=n)
            self._append_checkpoint(frames, range(start, end),
                                    R_out, t_out, valid_out, nm_out, ni_out)

        # One chunk kept IN FLIGHT: dispatch chunk c+1 (async) before
        # blocking on chunk c's outputs, so the per-dispatch tunnel RTT
        # (~28 ms — the 0.9 ms/pair "dispatch" line of the round-2 stage
        # budget at chunk 32) rides behind device compute instead of
        # serializing with it. Staging (decode + async H2D) already
        # overlapped; this overlaps the dispatch+readback edge too.
        # Results are flushed strictly in order (checkpoint contract).
        prev = None
        pending = _stage(starts[0]) if starts else None
        for si in range(len(starts)):
            start, end, arrs = pending
            out = _compute(arrs)
            # stage the next chunk while the device runs this one
            pending = _stage(starts[si + 1]) if si + 1 < len(starts) else None
            if prev is not None:
                _flush(prev)
            prev = (start, end, out)
        if prev is not None:
            _flush(prev)

        # Inlier-collapse fallback (config.EstimatorConfig.fallback_*,
        # round-5 verdict #9): pairs the work-cut profile could not hold
        # (invalid, or inliers below the profile's collapse threshold)
        # are re-estimated at the configured stronger profile. Scattered
        # pairs, so the pairs-batched program (not the sequence one) runs
        # them in ONE padded fixed-shape dispatch.
        if (cfg.fallback_profile and cfg.fallback_min_inliers > 0
                and starts):
            bad = np.where((~valid_out)
                           | (ni_out < cfg.fallback_min_inliers))[0]
            if bad.size:
                from ..config import profile_config
                from .estimator import estimate_pairs_batched

                fcfg = profile_config(cfg.fallback_profile)
                FB = 8  # fixed fallback batch shape (one compile)
                print(f"[INFO] Fallback: re-running {bad.size} collapsed "
                      f"pair(s) at profile {cfg.fallback_profile} "
                      f"(inliers < {cfg.fallback_min_inliers})")
                for s in range(0, bad.size, FB):
                    idxs = bad[s:s + FB]
                    sel = list(idxs) + [int(idxs[-1])] * (FB - len(idxs))
                    i1 = jnp.asarray(imgs[[i for i in sel]])
                    i2 = jnp.asarray(imgs[[i + 1 for i in sel]])
                    fkeys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(
                        [self.seed + i for i in sel], dtype=jnp.uint32))
                    fout = estimate_pairs_batched(i1, i2, K, fkeys,
                                                  cfg=fcfg)
                    fR = np.asarray(fout["R"])
                    ft = np.asarray(fout["t"])
                    fv = np.asarray(fout["valid"])
                    fnm = np.asarray(fout["num_matches"])
                    fni = np.asarray(fout["num_inliers"])
                    for j, i in enumerate(idxs):
                        # adopt only a strictly healthier answer: valid
                        # and more inliers than the collapsed one
                        if fv[j] and fni[j] > ni_out[i]:
                            R_out[i] = fR[j]
                            t_out[i] = ft[j]
                            valid_out[i] = True
                            nm_out[i] = fnm[j]
                            ni_out[i] = fni[j]
                self._append_checkpoint(frames, list(bad), R_out, t_out,
                                        valid_out, nm_out, ni_out)
        meter.stop(pairs=n_pairs)
        pps = meter.pairs_per_sec_per_chip()
        steady = meter.steady_pairs_per_sec_per_chip()
        if pps > 0:
            extra = (f", {steady:.2f} steady-state (compile excluded)"
                     if steady > 0 else "")
            print(f"[INFO] Throughput: {pps:.2f} pairs/sec/chip "
                  f"({meter.pairs} pairs incl. compile{extra})")
        return R_out, t_out, valid_out, nm_out

    def _load_checkpoint(self, frames, R_out, t_out, valid_out, nm_out,
                         ni_out):
        """Restore completed pairs from the jsonl checkpoint; returns the set
        of completed pair indices. Entries whose frame list does not match
        are ignored (stale checkpoints from a different run config)."""
        import json

        done = set()
        if self.checkpoint_path is None or not self.checkpoint_path.exists():
            return done
        n_pairs = len(frames) - 1
        lines = self.checkpoint_path.read_text().splitlines()
        # First record must be a header carrying the config hash of the run
        # that wrote the file; anything else (or a mismatch) means the
        # checkpoint came from a different configuration — discard it so
        # results from mixed configs can never be merged.
        want = self._config_hash()
        header_ok = False
        if lines:
            try:
                header_ok = json.loads(lines[0]).get("config_hash") == want
            except json.JSONDecodeError:
                pass
        if not header_ok:
            # Never truncate the stale file during a load — the user may have
            # pointed --checkpoint at the wrong path; move the old data aside
            # and let _append_checkpoint write a fresh header lazily.
            stale = self.checkpoint_path.with_suffix(
                self.checkpoint_path.suffix + ".stale")
            self.checkpoint_path.replace(stale)
            print(f"[WARN] Checkpoint {self.checkpoint_path} was written "
                  f"with a different config (or has no header); moved the "
                  f"old file to {stale}")
            return done
        for line in lines[1:]:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            i = rec.get("pair", -1)
            if not (0 <= i < n_pairs) or rec.get("frame2") != frames[i + 1]:
                continue
            R_out[i] = np.array(rec["R"]).reshape(3, 3)
            t_out[i] = np.array(rec["t"])
            valid_out[i] = bool(rec["valid"])
            nm_out[i] = int(rec["num_matches"])
            # records predating the num_inliers field must not re-trigger
            # the inlier-collapse fallback on resume
            ni_out[i] = int(rec.get("num_inliers", 10 ** 6))
            done.add(i)
        if done:
            print(f"[INFO] Resumed {len(done)} pairs from checkpoint "
                  f"{self.checkpoint_path}")
        return done

    def _append_checkpoint(self, frames, pair_range, R_out, t_out,
                           valid_out, nm_out, ni_out):
        if self.checkpoint_path is None:
            return
        import json

        self.checkpoint_path.parent.mkdir(parents=True, exist_ok=True)
        if not self.checkpoint_path.exists():
            self.checkpoint_path.write_text(
                json.dumps({"config_hash": self._config_hash()}) + "\n")
        with open(self.checkpoint_path, "a") as f:
            for i in pair_range:
                f.write(json.dumps({
                    "pair": i,
                    "frame2": int(frames[i + 1]),
                    "R": R_out[i].reshape(-1).tolist(),
                    "t": t_out[i].tolist(),
                    "valid": bool(valid_out[i]),
                    "num_matches": int(nm_out[i]),
                    "num_inliers": int(ni_out[i]),
                }) + "\n")

    def estimate_relative_poses(self, frames, imgs):
        """Raw consecutive-pair relative poses, no GT anchoring.

        The trajectory surface (cli/run_kitti_sequence.py, BASELINE config
        #4) chains these with pipeline/trajectory.accumulate_trajectory;
        process_sequence instead re-anchors each pair to GT per the
        reference contract (batch_processor.py:82-89).

        Returns (R_rel (N-1,3,3), t_rel (N-1,3) unit directions,
        valid (N-1,) bool, num_matches (N-1,) int) with x2 = R x1 + t.
        """
        return self._estimate_all_pairs(list(frames), imgs)

    def process_sequence(self, frame_indices):
        """Reference process_sequence semantics (batch_processor.py:38-116).

        Returns dict: frames, roll, pitch, yaw (np arrays), R (list of world
        rotations), t (list of (3,1) directions), valid (np bool array).
        """
        frames = list(frame_indices)
        if len(frames) < 2:
            raise ValueError("Need at least 2 frames to process")

        paths = [str(self.get_image_path(f)) for f in frames]
        # Lazy per-chunk decode (decode/compute overlap, SURVEY §5 perf):
        # the double-buffered _stage below decodes chunk c+1 between
        # dispatching chunk c and blocking on its outputs, so decode rides
        # behind device compute instead of serializing up front — and host
        # RAM stays O(chunk), not O(sequence).
        imgs = LazyFrameSource(
            paths, to_gray=True,
            cache_frames=max(2 * (self.chunk + 10), 64))

        R_rel, t_rel, valid, num_matches = self._estimate_all_pairs(frames, imgs)
        if self.strict and not valid.all():
            bad = frames[int(np.argmin(valid)) + 1]
            raise RuntimeError(
                f"Pose estimation failed for pair ending at frame {bad}")

        # GT anchor: orientation of each pair's first frame
        # (batch_processor.py:82-89).
        _, rpy1 = self.gt_loader.poses_for_frames(frames[:-1])
        R_prev = np.asarray(euler_to_rotation(
            rpy1[:, 2], rpy1[:, 1], rpy1[:, 0],
            convention=self.euler_convention))  # (N, 3, 3)

        # VP (Manhattan) refinement, GT-anchored like the reference batch
        # loop (estimate(img1, img2, R_prev=R_prev_world),
        # batch_processor.py:92). The reference recomputes both frames' VP
        # statistics for every pair (pose_estimator.py:541-542); here each
        # frame is computed ONCE for the whole sequence with batched device
        # labeling (geometry/vp_refine.manhattan_dirs_for_frames), and only
        # the rare gated LM runs per pair. Deviation: the pair-subsampling
        # rng seed is per-frame (frame index) instead of per-role (0/1).
        cfg = self.pose_estimator.config
        if cfg.vp.enabled:
            from ..geometry.vp_refine import (
                manhattan_dirs_for_frames,
                manhattan_dirs_for_frames_device,
                optimize_rotation_from_vps,
                vp_cost,
            )

            # RPE_VP_DEVICE=1: voting also on device (one dispatch per
            # frame chunk, no per-frame host loop); gate statistics match
            # the host twin except in the pair-sampling regime (PARITY.md
            # VP device row), so it is opt-in until the goldens are
            # regenerated with it.
            import os

            dirs_fn = (manhattan_dirs_for_frames_device
                       if os.environ.get("RPE_VP_DEVICE") == "1"
                       else manhattan_dirs_for_frames)

            K = np.asarray(self.pose_estimator.K, dtype=np.float64)
            stats = []
            ch = 8  # frames per labeling dispatch (bounds device memory)
            for s in range(0, len(frames), ch):
                blk = np.asarray(imgs[s:s + ch])
                pad = ch - blk.shape[0]
                if pad:
                    # pad the remainder to the chunk shape: the labeling /
                    # voting programs are lax.map'ed and shape-keyed, and
                    # a remote compile costs minutes per program shape
                    # (CLAUDE.md hazard #4) — one shape, one compile
                    blk = np.concatenate(
                        [blk, np.repeat(blk[-1:], pad, axis=0)])
                got = dirs_fn(blk, K, cfg.vp)
                stats.extend(got[:ch - pad] if pad else got)

            def reliable(entry):
                _, ok, dbg = entry
                return (ok and dbg.get("acc_max", 0.0) >= cfg.vp.acc_min
                        and dbg.get("vp2_score", 0.0) >= cfg.vp.vp2_min)

            for i in range(len(frames) - 1):
                if not valid[i]:
                    continue
                if not (reliable(stats[i]) and reliable(stats[i + 1])):
                    continue
                Delta_prev = stats[i][0]
                Delta_new = stats[i + 1][0]
                R_new_init = R_prev[i] @ R_rel[i]
                D_world = R_prev[i].T @ Delta_prev
                cost_init = vp_cost(R_new_init, Delta_new, D_world)
                R_opt = optimize_rotation_from_vps(
                    R_new_init, Delta_new, D_world, cfg.vp)
                if (vp_cost(R_opt, Delta_new, D_world)
                        < cost_init - cfg.vp.cost_improve_eps):
                    R_rel[i] = R_prev[i].T @ R_opt
        R_world = R_prev @ R_rel  # (N, 3, 3)
        yaw, pitch, roll = (np.asarray(a) for a in rotation_to_euler(
            R_world, convention=self.euler_convention))

        return {
            "frames": frames[1:],
            "roll": np.asarray(roll),
            "pitch": np.asarray(pitch),
            "yaw": np.asarray(yaw),
            "R": [R_world[i] for i in range(R_world.shape[0])],
            "t": [t_rel[i].reshape(3, 1) for i in range(t_rel.shape[0])],
            "valid": valid,
            "num_matches": num_matches,
        }

    def process_at_interval(self, step: int = 15):
        """Frames at the given interval (reference batch_processor.py:118-129)."""
        frame_indices = self.gt_loader.get_frame_indices(step=step)
        return self.process_sequence(frame_indices)
