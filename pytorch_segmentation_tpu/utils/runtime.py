"""Runtime setup shared by the CLI entry points: persistent XLA compilation
cache (first DeepLabV3+ compile is ~20-40s on TPU; cached afterwards) and
optional NaN debugging (the framework's sanitizer — SURVEY.md §5)."""

from __future__ import annotations

import os

import jax

__all__ = ["setup_runtime"]


def setup_runtime(cache_dir: str | None = None, debug_nans: bool = False):
    cache_dir = cache_dir or os.environ.get(
        "PSEG_COMPILE_CACHE", os.path.expanduser("~/.cache/pseg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flag
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
