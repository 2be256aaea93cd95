"""Multi-host (multi-slice) initialization helpers.

Single-host multi-chip needs nothing special (jax.devices() sees the slice).
Across hosts/slices, JAX requires jax.distributed.initialize before any
backend use; pair shards then ride DCN between slices while the per-slice
collectives stay on ICI (SURVEY.md §2.3, communication-backend row).

This module is exercised in CI only in single-process mode (the environment
has one chip); the multi-process path follows the standard JAX recipe and is
kept thin on purpose.
"""

from __future__ import annotations

import os


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize multi-host JAX if configured; returns True when active.

    Configuration via args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op
    (returns False) when nothing is configured — single-host mode.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else os.environ.get("JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def global_pairs_mesh():
    """1-D 'pairs' mesh over all global devices (all hosts)."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("pairs",))
