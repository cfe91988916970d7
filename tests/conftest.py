"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-host simulation strategy described in SURVEY.md section 4
(the reference has randomized end-to-end ctest sweeps only; we add unit and
sharding tests the reference lacks).

Note: this image's sitecustomize registers a TPU backend and programmatically
forces the platform, so setting JAX_PLATFORMS in the environment is not
enough -- we must update jax.config after import.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags += " --xla_force_host_platform_device_count=8"
# Skip the expensive LLVM optimization passes: 2-3x faster XLA:CPU
# compiles of the big crypto kernels; runtime slowdown is irrelevant at
# test shapes.  Safe only because compiled programs are dropped between
# modules (see _drop_compiled_programs_between_modules below); opt out
# with PA_TPU_NO_FAST_COMPILE=1.
if not os.environ.get("PA_TPU_NO_FAST_COMPILE") and (
    "xla_backend_optimization_level" not in xla_flags
):
    xla_flags += (
        " --xla_backend_optimization_level=0"
        " --xla_llvm_disable_expensive_passes=true"
    )
os.environ["XLA_FLAGS"] = xla_flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA compiles of the unrolled bignum kernels
# are expensive; cache them across test runs.  XLA:CPU AOT artifacts embed
# target machine features, and loading a cache written on a different host
# silently degrades into pathologically slow (or SIGILL-prone) execution --
# and /proc/cpuinfo is NOT discriminating enough to fingerprint a host
# (identical model/flags lines across VMs whose XLA-detected features
# differ, e.g. prefer-no-scatter).  Key the cache by boot id instead: it
# only ever lives for one machine session, which is the reuse that matters.
try:
    with open("/proc/sys/kernel/random/boot_id") as f:
        _boot = f.read().strip()
except OSError:
    _boot = "noboot"
# Per-xdist-worker cache subdirectory (loadfile distribution keeps each
# file on a stable worker, so per-worker caches still get warm across
# runs).  PA_TPU_NO_COMPILE_CACHE=1 disables the persistent cache
# entirely (diagnostic escape hatch).
if not os.environ.get("PA_TPU_NO_COMPILE_CACHE"):
    _worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/pa_tpu_jax_cache_{_boot}_{_worker}"
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture
def nprng():
    return np.random.default_rng(0xC0FFEE)


@pytest.fixture(autouse=True)
def _drop_compiled_programs_between_tests():
    """Release compiled XLA executables after every test.

    The crypto kernels compile to very large CPU programs; once a few
    dozen accumulate in one process, the NEXT compile segfaults inside
    XLA:CPU (reproduced deterministically: serial and xdist, persistent
    cache on or off, opt flags on or off, stack limit raised -- and a
    single heavy module can reach the budget on its own, e.g. the third
    (n, c) sweep config).  Dropping the executables after each test
    bounds live compiled code to one test's worth; recompiles in later
    tests reload from the persistent cache cheaply (no LLVM).
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
