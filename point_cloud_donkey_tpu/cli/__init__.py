"""Command-line tools (eval_tool analogs).

Shared platform hook: the axon TPU plugin ignores the standard
``JAX_PLATFORMS`` environment variable, so the CLIs honor
``PCD_PLATFORM`` (e.g. ``PCD_PLATFORM=cpu``) by forcing the platform
through ``jax.config`` BEFORE the first backend use.  This keeps every
tool usable on the host CPU during accelerator outages.
"""

import os


def apply_platform_env() -> None:
    """Force the JAX platform from ``PCD_PLATFORM`` if set.  Must be called
    before any jax device/backend query; each CLI main() calls it first.
    Also enables the persistent XLA compilation cache (utils/jax_cache.py)
    so repeated CLI invocations skip recompiling the pipeline programs."""
    plat = os.environ.get("PCD_PLATFORM", "").strip()
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
