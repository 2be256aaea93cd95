"""Tracing, profiling, and structured logging (SURVEY.md §5, tracing row).

The reference has only [INFO] prints (reference pipeline.py:122-130). Here:
  * `StageTimer`: wall-clock per pipeline stage with a device-sync barrier
    that works on tunneled backends (device->host transfer of one scalar —
    `jax.block_until_ready` can return before remote completion).
  * `ThroughputMeter`: pairs/sec/chip — the north-star counter.
  * `trace`: context manager around jax.profiler for device traces.
  * `log`: structured [LEVEL] printing matching the reference's prefixes.
"""

from __future__ import annotations

import contextlib
import json
import time

import numpy as np


def sync(x) -> None:
    """Reliable device barrier: pull one element to the host."""
    import jax.numpy as jnp

    leaf = x
    try:
        import jax

        leaves = jax.tree.leaves(x)
        if leaves:
            leaf = leaves[0]
    except Exception:
        pass
    if hasattr(leaf, "shape"):
        np.asarray(jnp.ravel(leaf)[:1])


def log(level: str, msg: str, **fields) -> None:
    """[INFO]/[DEBUG]/[WARN] prefixed line, + optional JSON fields."""
    suffix = f" {json.dumps(fields)}" if fields else ""
    print(f"[{level.upper()}] {msg}{suffix}")


class StageTimer:
    """Accumulates per-stage wall-clock times."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            sync(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {
            name: {"total_s": round(t, 4),
                   "count": self.counts[name],
                   "mean_ms": round(1000 * t / self.counts[name], 3)}
            for name, t in self.totals.items()
        }

    def print_report(self):
        for name, row in self.report().items():
            log("info", f"stage {name}: {row['mean_ms']} ms x "
                        f"{row['count']} = {row['total_s']} s")


class ThroughputMeter:
    """pairs/sec/chip counter (BASELINE.md north-star metric).

    Two readings: the total rate (includes the first dispatch's compile,
    which on the tunneled TPU backend is minutes of remote compilation) and
    the steady-state rate (laps after the first), so CLI output does not
    understate the real per-pair rate. Record each dispatch with `lap()`.
    """

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.pairs = 0
        self.elapsed = 0.0
        self.laps: list[tuple[int, float]] = []  # (pairs, seconds)
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def lap(self, pairs: int, sync_on=None):
        """Record one dispatch of `pairs` pairs since start()/last lap()."""
        if sync_on is not None:
            sync(sync_on)
        t = time.perf_counter()
        self.laps.append((pairs, t - self._t0))
        self._t0 = t

    def stop(self, pairs: int, sync_on=None):
        if sync_on is not None:
            sync(sync_on)
        self.elapsed += time.perf_counter() - self._t0
        self.pairs += pairs
        if self.laps:
            # start()/lap() usage: laps carry the truth; fold them in.
            self.pairs = sum(p for p, _ in self.laps)
            self.elapsed = sum(t for _, t in self.laps)

    def pairs_per_sec_per_chip(self) -> float:
        if self.elapsed <= 0:
            return 0.0
        return self.pairs / self.elapsed / self.n_chips

    def steady_pairs_per_sec_per_chip(self) -> float:
        """Rate excluding the first lap (compile + warmup). 0.0 if <2 laps."""
        if len(self.laps) < 2:
            return 0.0
        p = sum(l[0] for l in self.laps[1:])
        t = sum(l[1] for l in self.laps[1:])
        if t <= 0:
            return 0.0
        return p / t / self.n_chips


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace via jax.profiler (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
