"""Runtime setup shared by the CLI entry points: persistent XLA compilation
cache (first DeepLabV3+ compile is ~20-40s on TPU; cached afterwards) and
optional NaN debugging (the framework's sanitizer — SURVEY.md §5)."""

from __future__ import annotations

import os

import jax

__all__ = ["setup_runtime"]


def setup_runtime(cache_dir: str | None = None, debug_nans: bool = False):
    # honor an explicit JAX_PLATFORMS from the user: this environment's
    # sitecustomize force-registers the tunneled 'axon' TPU backend and
    # overrides the platform config AFTER jax parsed the env, so
    # `JAX_PLATFORMS=cpu python train.py ...` would silently still target
    # the TPU without this re-apply
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and env_platforms != "axon":
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass
    cache_dir = cache_dir or os.environ.get(
        "PSEG_COMPILE_CACHE", os.path.expanduser("~/.cache/pseg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flag
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
