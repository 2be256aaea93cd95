"""Device mesh helpers for pair-level data parallelism.

The workload's only cross-device axis is the embarrassingly-parallel image
*pair* axis (SURVEY.md §2.3): a 1-D mesh ('pairs') shards the batched fused
estimator; metric reductions ride ICI via psum (collectives.py). A second
'hyp' axis is available for sharding the RANSAC hypothesis batch of a single
huge pair across chips (model-parallel analogue) — used by the multi-chip
dry run to exercise a 2-D mesh.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pairs_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the pair axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("pairs",))


def pairs_hyp_mesh(n_devices: int | None = None) -> Mesh:
    """2-D mesh (pairs, hyp): DP over pairs x sharded RANSAC hypotheses."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    hyp = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(np.array(devs).reshape(n // hyp, hyp), ("pairs", "hyp"))


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over 'pairs' for (B, ...) arrays."""
    return NamedSharding(mesh, P("pairs"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pairs(mesh: Mesh, *arrays):
    """device_put each (B, ...) array with its leading axis over 'pairs'."""
    s = pair_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)
