"""Runtime setup shared by the CLI entry points: persistent XLA compilation
cache (first DeepLabV3+ compile is ~20-40s on TPU; cached afterwards) and
optional NaN debugging (the framework's sanitizer — SURVEY.md §5)."""

from __future__ import annotations

import os

import jax

__all__ = ["setup_runtime", "tpu_compiler_options", "jit_with_options"]


def jit_with_options(fun, donate_argnums=(), static_argnums=(),
                     out_shardings=None, compiler_options=None):
    """jax.jit that applies per-compile XLA `compiler_options` (shipped with
    the remote compile request — XLA_FLAGS is parsed by the LOCAL cpu jaxlib,
    which rejects TPU-only flags). Falls back to plain jit when no options.

    Caches one executable per (tree structure, leaf avals, static args) —
    the same re-compile policy as jit (multi-scale training hits several
    shapes)."""
    import jax  # local to keep module import light

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    jitted = jax.jit(fun, donate_argnums=donate_argnums,
                     static_argnums=static_argnums, **kw)
    if not compiler_options:
        return jitted
    cache = {}

    def wrapper(*args):
        statics = tuple(args[i] for i in static_argnums)
        leaves, treedef = jax.tree.flatten(
            tuple(a for i, a in enumerate(args) if i not in static_argnums))
        # sharding + weak_type are part of the key: a same-shaped call with a
        # different placement must not reuse an executable lowered for the
        # first placement (JAX would raise at call time, but recompiling is
        # the correct behavior)
        key = (statics, treedef,
               tuple((getattr(l, "shape", None), str(getattr(l, "dtype", "")),
                      str(getattr(l, "sharding", None)),
                      getattr(l, "weak_type", None))
                     for l in leaves))
        exe = cache.get(key)
        if exe is None:
            exe = jitted.lower(*args).compile(
                compiler_options=compiler_options)
            cache[key] = exe
        return exe(*(a for i, a in enumerate(args)
                     if i not in static_argnums))
    # expose the underlying jit's lower/eval_shape so AOT tools
    # (tools/dump_hlo.py) work whether or not compiler options are active,
    # and the jit object itself for callers that need to TRACE the step
    # inside a larger program (the AOT executable can't take tracers —
    # e.g. tools/parity_augment.py's whole-training scan)
    wrapper.lower = jitted.lower
    wrapper.eval_shape = jitted.eval_shape
    wrapper.jitted = jitted
    return wrapper


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
    # PSEG_CPU_DEVICES=N: virtual CPU device count for the CLIs (e.g.
    # driving train.py --tp 4 on a CPU mesh; tests set the equivalent in
    # conftest). Re-applied here for the same sitecustomize reason.
    n_cpu = os.environ.get("PSEG_CPU_DEVICES")
    if n_cpu:
        try:
            jax.config.update("jax_num_cpu_devices", int(n_cpu))
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


def tpu_compiler_options() -> dict | None:
    """XLA compiler options for the hot jitted steps on TPU.

    Default raises the scoped-VMEM fusion budget to 32 MiB: the optimized
    HLO shows the big conv+BN mega-fusions pinned at ~13-15 MB of the
    ~16 MiB default, and an interleaved A/B measured 1.017x at 32 MiB
    (64 MiB is back to 1.000x — non-monotonic; see PERF.md round 2).

    Override with PSEG_XLA_OPTS="k=v,k2=v2"; set PSEG_XLA_OPTS="" to
    disable. Returns None off-TPU (the flags are TPU-specific and the CPU
    compiler rejects unknown options).
    """
    try:
        if jax.devices()[0].platform != "tpu":
            return None
    except Exception:
        return None
    return parse_xla_opts(os.environ.get("PSEG_XLA_OPTS"))


def parse_xla_opts(env: str | None) -> dict | None:
    """PSEG_XLA_OPTS="k=v,k2=v2" -> dict; "" -> None (disabled);
    unset -> the measured default."""
    if env is not None:
        env = env.strip()
        if not env:
            return None
        return dict(kv.split("=", 1) for kv in env.split(","))
    return {"xla_tpu_scoped_vmem_limit_kib": "32768"}
