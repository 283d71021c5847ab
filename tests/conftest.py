"""Test configuration: CPU backend with a virtual 8-device mesh, f64 on.

The CPU jit path is the "fake backend" for device-free CI (the role of the
reference's pure-Java BEAGLE fallback, SURVEY.md §4.7); sharding tests use
the 8 virtual devices.

NOTE: this image pre-imports jax via an `axon` sitecustomize hook and sets
JAX_PLATFORMS=axon, so plain env vars in conftest are too late; we redirect
through jax.config before any backend initializes.
"""

import os

# XLA_FLAGS is read when the CPU client is created (lazily) — still in time.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: TestXML files re-trace near-identical
# 6-taxon chain programs; caching compiled executables across files AND
# runs is what keeps the 12-file core inside the CI window (the role of
# the reference's single-JVM warm JIT across its suite)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: extended TestXML files (run with -m '' or -m slow)"
    )
