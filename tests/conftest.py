"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh *before* any backend is created,
so the suite runs fast anywhere and multi-chip sharding tests (SURVEY.md
section 4) work without real chips: sharded anomaly rates must equal
single-device rates after psum.

Note: this environment may ship a TPU plugin that overrides the JAX_PLATFORMS
env var at registration time, so we additionally pin the platform through
jax.config, which wins over the plugin.
"""

import os

# Must run before the first backend creation.  pytest imports conftest.py
# before collecting test modules, which guarantees ordering.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full profile; also CIA_FULL_TESTS=1)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy end-to-end / training / mesh tests, skipped by default; "
        "run with --runslow or CIA_FULL_TESTS=1 (do this before committing)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("CIA_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow: use --runslow or CIA_FULL_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
