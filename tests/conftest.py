"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware.

Note: the axon sitecustomize force-registers the TPU backend regardless of
JAX_PLATFORMS, so we must override via jax.config before any backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound: XLA:CPU's thunk runtime LLVM-compiles every
# fusion kernel as its own module on this 1-core host (~1400 kernels /
# 200-330 s for one tiny-config jit_init at the default opt level). Tests
# validate NUMERICS, not CPU codegen quality — drop LLVM effort (measured
# 216 s → 36 s for jit_init; pure compile-time knobs, no fast-math).
# EPRECON_FULL_LLVM=1 opts back into default codegen.
if (os.environ.get("EPRECON_FULL_LLVM") != "1"
        and "xla_backend_optimization_level" not in flags):
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the heavy tests (CLI end-to-end, quality loop)
# spend nearly all their time in XLA CPU compiles of identical programs —
# cached, a repeat full-suite run drops from ~80 min to minutes.
# EPRECON_NO_COMPILE_CACHE opts out (the 8-device sharded train-step
# executable has segfaulted XLA CPU's serializer; its subprocess-isolated
# test sets this).
if os.environ.get("EPRECON_NO_COMPILE_CACHE") != "1":
    _cache = os.path.expanduser("~/.cache/jax_compilation_cpu_tests")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
