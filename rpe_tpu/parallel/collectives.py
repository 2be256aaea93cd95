"""Cross-device metric reductions (ICI collectives).

The evaluator's summary statistics (reference pose_evaluator.py:136-157) are
the only cross-pair reduction in the workload; on a mesh they become psum /
all_gather over the 'pairs' axis instead of a host gather (SURVEY.md §2.3,
communication-backend row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def sharded_error_stats(errors, valid, mesh):
    """Masked mean/min/max of per-pair errors, reduced with psum over ICI.

    errors, valid: (B,) arrays sharded over 'pairs'. Returns dict of scalars
    (replicated). Median needs a gather and is computed host-side by the
    evaluator; mean/extrema reduce tree-wise on device.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs")),
        out_specs=P(),
    )
    def _stats(e, v):
        vf = v.astype(e.dtype)
        s = jax.lax.psum(jnp.sum(e * vf), "pairs")
        n = jax.lax.psum(jnp.sum(vf), "pairs")
        s2 = jax.lax.psum(jnp.sum(e * e * vf), "pairs")
        mx = jax.lax.pmax(jnp.max(jnp.where(v, e, -jnp.inf)), "pairs")
        mn = jax.lax.pmin(jnp.min(jnp.where(v, e, jnp.inf)), "pairs")
        mean = s / jnp.maximum(n, 1.0)
        var = jnp.maximum(s2 / jnp.maximum(n, 1.0) - mean * mean, 0.0)
        return jnp.stack([mean, jnp.sqrt(var), mx, mn, n])

    out = _stats(errors, valid)
    return {
        "mean": out[0], "std": out[1], "max": out[2], "min": out[3],
        "count": out[4],
    }
