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
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import hashlib
import platform

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA compiles of the unrolled bignum kernels
# are expensive; cache them across test runs.  The dir is keyed by a host
# fingerprint: XLA:CPU AOT artifacts embed target machine features, and
# loading a cache written on a different host silently degrades into
# pathologically slow (or SIGILL-prone) execution.
try:
    with open("/proc/cpuinfo") as f:
        _flags = [l for l in f if l.startswith("flags")][:1]
except OSError:
    _flags = []
_host = hashlib.sha256(
    (platform.machine() + "".join(_flags)).encode()
).hexdigest()[:16]
jax.config.update("jax_compilation_cache_dir", f"/tmp/pa_tpu_jax_cache_{_host}")
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
