"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment's sitecustomize registers the 'axon' TPU platform and
sets jax_platforms programmatically, so the JAX_PLATFORMS env var alone is NOT
enough — we must override the config after import (before any computation).
XLA_FLAGS must still be set before the CPU backend initializes.
"""

import os

# the persistent compile cache may hold XLA:CPU AOT entries produced on a
# host with different CPU features (driver machines vary); the loader logs a
# full feature dump per entry — silence it (entries still load or recompile)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the tiny-UNet jit compiles dominate test time
# on CPU; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, jax.devices()


# Two-tier suite: the e2e pipeline/sharding/CLI tests dominate wall clock
# (full suite ~35 min on CPU) — a suite too slow to run per-change stops
# being a regression net. Fast tier: `pytest -m "not slow"` (< 3 min).
_SLOW_MODULES = {
    "test_sharding",
    "test_pipeline",
    "test_cascade",
    "test_cli",
    "test_vsr",
    "test_interpolate",
    "test_train",
    "test_fullwidth_loop",  # 909M torch UNet on one CPU core (~10 min)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
