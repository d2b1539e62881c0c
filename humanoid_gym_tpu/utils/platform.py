"""Platform selection shim.

Some TPU harnesses pin ``jax_platforms`` through ``jax.config`` in a
sitecustomize hook at interpreter start, which silently overrides the
``JAX_PLATFORMS`` environment variable. Entry points call
``apply_platform_env()`` right after importing jax so the user's env var
wins again (e.g. ``JAX_PLATFORMS=cpu python scripts/train.py`` for a CPU
debug run).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass
