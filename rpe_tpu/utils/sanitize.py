"""Numeric sanitizers for the compiled path (SURVEY.md §5, race-detection /
sanitizer row: "jit purity + jax.debug checks").

The reference is single-threaded Python with nothing to race; the TPU
pipeline's analogous hazards are silent non-finite values flowing through
the masked-validity path and rotation drift from low-precision matmuls.
`audit()` inserts `jax.debug.print` counters at key pipeline joints when
RPE_DEBUG_CHECKS is set in the environment AT TRACE TIME — with the flag
unset the calls trace to nothing, so the production program is unchanged
(the flag is a compile-time constant, not a runtime branch; re-jit after
changing it).

jit purity itself is audited by tests (estimate_pair determinism,
tests/test_estimator.py::test_estimate_pair_deterministic) — buffer
donation is not used anywhere in the pipeline, so there is nothing to
alias-audit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def checks_enabled() -> bool:
    """Trace-time switch: RPE_DEBUG_CHECKS=1 enables in-program audits."""
    return bool(os.environ.get("RPE_DEBUG_CHECKS"))


def audit_finite(name: str, **arrays) -> None:
    """Print per-array non-finite element counts (no-op unless enabled)."""
    if not checks_enabled():
        return
    for key, a in arrays.items():
        a = jnp.asarray(a)
        if not jnp.issubdtype(a.dtype, jnp.floating):
            continue
        bad = jnp.sum(~jnp.isfinite(a))
        jax.debug.print(
            "[AUDIT] {}/{}: nonfinite={} of {}", name, key, bad, a.size)


def audit_rotation(name: str, R) -> None:
    """Print orthonormality drift ||R R^T - I||_max (no-op unless enabled)."""
    if not checks_enabled():
        return
    R = jnp.asarray(R)
    eye = jnp.eye(3, dtype=R.dtype)
    err = jnp.max(jnp.abs(jnp.matmul(R, jnp.swapaxes(R, -1, -2)) - eye))
    jax.debug.print("[AUDIT] {}: max |R R^T - I| = {}", name, err)
