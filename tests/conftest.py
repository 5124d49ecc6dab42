"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/halo-exchange tests
run against XLA's host-platform device virtualization instead. These env vars
must be set before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize registers the axon TPU backend and overrides
# JAX_PLATFORMS; force the platform list back to cpu before any backend
# initialization happens.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Tiered suite (VERDICT r4 weak 6): XLA-compile-heavy tests carry
# @pytest.mark.slow and are skipped by default so the per-change loop
# stays fast; `--runslow` (CI / end-of-round) runs everything.


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (XLA-compile-heavy; full suite)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: XLA-compile-heavy test, skipped unless --runslow is given",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
