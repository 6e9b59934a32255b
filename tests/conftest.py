"""Test harness configuration.

Forces the CPU backend with 8 virtual devices so the sharding/multi-chip
tests run anywhere (SURVEY.md §4.6: the fake multi-chip backend).  The
real-TPU benchmarks live in bench.py, not the test suite.

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin
("axon") at interpreter boot and rewrites JAX_PLATFORMS, so plain
``JAX_PLATFORMS=cpu`` in the shell is NOT enough — the config must be forced
after jax import but before backend initialisation, which is exactly what
this conftest does (it is imported before any test module).
"""

import os

# ALTAIR_TEST_PLATFORM=tpu opts OUT of the CPU forcing — used only to run
# tests/test_tpu_hardware.py (the on-real-chip Pallas pins) against the
# tunnel device.  Everything else in the suite assumes the 8-device CPU
# mesh and is not meant to run under it.
_TEST_PLATFORM = os.environ.get("ALTAIR_TEST_PLATFORM", "cpu")

if _TEST_PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _TEST_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Free compiled programs between test modules: a single pytest process
# accumulates hundreds of live XLA:CPU executables across the suite, and
# past ~250 programs the NEXT compilation segfaults inside
# backend_compile_and_load (deterministic at tests/test_trace_direct.py::
# test_recursive_hybrid_consistent_across_buffer_sizes when quick+medium
# run combined; each tier alone is fine).  Dropping caches per module
# bounds the live-executable count; with the persistent compile cache
# below, cross-module re-uses come back as cheap AOT loads.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
    from altair_tpu.core.memo import clear_memo

    clear_memo()


# Persistent XLA compilation cache: suite runtime on this 1-core box is
# dominated by CPU compiles (medium tier measured 21 min cold / ~7 min
# warm — tests/README.md), and the cache key is the optimized HLO, so
# code changes invalidate exactly the programs they touch.  Same-machine
# AOT loads log a benign "prefer-no-scatter/gather" feature-mismatch
# E-line; correctness is unaffected (the suite re-validates physics).
if _TEST_PLATFORM == "cpu":
    _cache = os.environ.get(
        "ALTAIR_TEST_COMPILE_CACHE",
        os.path.expanduser("~/.cache/altair_tpu_test_xla"))
    if _cache != "off":
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
