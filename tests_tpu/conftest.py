"""TPU-only test configuration.

Unlike tests/conftest.py this does NOT pin the platform to CPU: these
tests exercise the compiled Pallas kernels on the real chip.  Run with

    python -m pytest tests_tpu/ -q -p xdist -n 0

(serial: the suite shares one TPU).  Tests skip themselves when no
TPU/axon device is present.
"""

import jax
import pytest

try:
    with open("/proc/sys/kernel/random/boot_id") as f:
        _boot = f.read().strip()
except OSError:
    _boot = "noboot"
jax.config.update("jax_compilation_cache_dir", f"/tmp/pa_tpu_jax_cache_{_boot}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU device")
        for item in items:
            item.add_marker(skip)
