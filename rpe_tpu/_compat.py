"""Platform selection helper.

The deployment environment may pin JAX_PLATFORMS to a remote TPU backend via
sitecustomize; `ensure_platform` honors an RPE_PLATFORM env override ("cpu"
or "tpu"/"axon") through jax.config, which works even when the env var route
is pre-empted by the sitecustomize preload.
"""

from __future__ import annotations

import os


def ensure_platform():
    plat = os.environ.get("RPE_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
