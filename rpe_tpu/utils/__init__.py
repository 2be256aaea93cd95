"""Cross-cutting utilities: observability (timers, throughput, tracing)."""

from .observability import StageTimer, ThroughputMeter, log, sync, trace
from .sanitize import audit_finite, audit_rotation, checks_enabled

__all__ = ["StageTimer", "ThroughputMeter", "log", "sync", "trace"]
