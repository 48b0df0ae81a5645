"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on XLA's host-platform virtual devices instead (same SPMD partitioner).

NOTE: this image's sitecustomize imports jax at interpreter startup (axon TPU
plugin), so env vars set here are too late for jax's config snapshot — we use
`jax.config.update` instead, which takes effect before backends initialize.
"""

import os

# Must precede first backend initialization (backends are created lazily).
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # never run unit tests on TPU
jax.config.update("jax_enable_x64", True)   # f64 oracles for golden tests


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, "virtual 8-device CPU mesh required"


_last_module = [None]


def pytest_runtest_setup(item):
    # Drop compiled executables between test MODULES: XLA:CPU segfaults
    # once a single process accumulates the full suite's program count
    # (observed deterministically at tests/test_tracking.py after ~95
    # compiles; fine in any half-suite run). The persistent compilation
    # cache (per-platform dir, sdv_loam_tpu/__init__.py) makes cross-module
    # recompiles cheap reloads.
    mod = item.module.__name__
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
