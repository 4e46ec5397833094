"""utils.runtime: compiler-option plumbing and the options-aware jit."""

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.utils.runtime import (jit_with_options,
                                                    parse_xla_opts,
                                                    tpu_compiler_options)


def test_parse_xla_opts():
    assert parse_xla_opts("") is None
    assert parse_xla_opts("  ") is None
    assert parse_xla_opts("a=1") == {"a": "1"}
    assert parse_xla_opts("a=1,b=x=y") == {"a": "1", "b": "x=y"}
    # unset -> measured TPU default (PERF.md round 2)
    assert parse_xla_opts(None) == {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def test_compiler_options_off_tpu():
    # CPU test backend: options must be suppressed (TPU-only flags)
    assert jax.devices()[0].platform == "cpu"
    assert tpu_compiler_options() is None


def test_jit_with_options_plain_fallback():
    f = jit_with_options(lambda x: x * 2, compiler_options=None)
    assert hasattr(f, "lower")  # plain jax.jit passthrough
    assert float(f(jnp.float32(3.0))) == 6.0


def test_jit_with_options_caches_per_shape_and_static():
    calls = []

    def fn(x, n):
        calls.append(1)
        return x * n

    # force the wrapper path with an empty-but-truthy dict? options must be
    # valid for the backend: use a benign XLA flag accepted on CPU
    f = jit_with_options(fn, static_argnums=(1,),
                         compiler_options={"xla_cpu_enable_fast_math":
                                           "False"})
    a = jnp.ones((4,), jnp.float32)
    b = jnp.ones((8,), jnp.float32)
    assert float(f(a, 2).sum()) == 8.0
    assert float(f(a, 2).sum()) == 8.0   # cache hit: no retrace
    assert float(f(b, 2).sum()) == 16.0  # new shape -> new executable
    assert float(f(a, 3).sum()) == 12.0  # new static -> new executable
    assert len(calls) == 3
