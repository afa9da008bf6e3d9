"""Test configuration.

Runs the whole suite on a virtual 8-device CPU mesh with float64 enabled,
per SURVEY.md section 4 ("multi-device tests on a host-forced 8-device
CPU mesh") and section 7 (f64 parity harness).

Must set env vars before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and
# sets JAX_PLATFORMS=axon before our env vars apply; override via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# Unit/integration split with an env switch, mirroring the reference's
# OCTOFITTER_TEST_MODE (`test/runtests.jl:9-13`): "unit" skips tests
# marked integration (end-to-end MCMC), "integration" runs only those,
# unset/"all" runs everything.


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "integration: end-to-end MCMC / slow workflow test"
    )


def pytest_collection_modifyitems(config, items):
    mode = os.environ.get("OCTOFITTER_TEST_MODE", "all").lower()
    if mode in ("", "all"):
        return
    if mode == "unit":
        skip = pytest.mark.skip(reason="OCTOFITTER_TEST_MODE=unit")
        for item in items:
            if item.get_closest_marker("integration"):
                item.add_marker(skip)
    elif mode == "integration":
        skip = pytest.mark.skip(reason="OCTOFITTER_TEST_MODE=integration")
        for item in items:
            if not item.get_closest_marker("integration"):
                item.add_marker(skip)
