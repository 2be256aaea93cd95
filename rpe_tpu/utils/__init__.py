"""Cross-cutting utilities: observability (timers, throughput, tracing)."""

from .observability import StageTimer, ThroughputMeter, log, sync, trace

__all__ = ["StageTimer", "ThroughputMeter", "log", "sync", "trace"]
