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
import subprocess
import sys
import time

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
    config.addinivalue_line(
        "markers",
        "isolate: run in a fresh subprocess — XLA:CPU's allocator/compile "
        "caches grow monotonically across a pytest process, and the suite's "
        "largest shard_map graphs SIGABRT (std::bad_alloc) when dispatched "
        "on top of ~180 earlier tests' cached executables (VERDICT r4: "
        "reproduced 2/2 at test_tiling_pipeline.py; jax.clear_caches() does "
        "NOT bound the peak).  Every test in these modules passes alone.",
    )


# Modules whose graphs are big enough to tip the cumulative XLA:CPU
# allocator over in a long-lived suite process (see the isolate marker).
# Policy: EVERY module that compiles mesh/shard_map or plate-scale graphs
# runs isolated — the abort point is position-dependent (r4 hit
# test_tiling_pipeline; with round 5's extra graphs in the main process it
# moved to test_screening_tiled_route), so isolating only the observed
# crasher just relocates it.  ~12 extra subprocess spawns cost ~3 min of
# interpreter+jax startup; the main suite process then never holds a mesh
# graph.
_ISOLATE_MODULES = {
    "test_tiling_pipeline.py",
    "test_plate_screening.py",
    "test_screening_tiled_route.py",
    "test_plate_capacity.py",
    "test_sharded_scoring.py",
    "test_sharded_training.py",
    "test_tiling.py",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("CIA_ISOLATED") != "1":
        for item in items:
            if item.path.name in _ISOLATE_MODULES:
                item.add_marker(pytest.mark.isolate)
    if config.getoption("--runslow") or os.environ.get("CIA_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow: use --runslow or CIA_FULL_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_runtest_protocol(item, nextitem):
    """Subprocess-per-test runner for isolate-marked tests (a minimal
    pytest-forked): the child runs exactly one nodeid in a fresh interpreter,
    so its XLA:CPU allocator peak is its own, and a child crash (SIGABRT)
    becomes a normal test failure instead of killing the whole suite."""
    if os.environ.get("CIA_ISOLATED") == "1":
        return None
    if not item.get_closest_marker("isolate"):
        return None
    if item.get_closest_marker("skip") or item.get_closest_marker("skipif"):
        return None  # let the default protocol produce the skip report
    ihook = item.ihook
    ihook.pytest_runtest_logstart(nodeid=item.nodeid, location=item.location)
    env = dict(os.environ, CIA_ISOLATED="1", CIA_FULL_TESTS="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         item.nodeid],
        capture_output=True, text=True, env=env,
        cwd=str(item.config.rootpath),
    )
    duration = time.time() - t0
    passed = proc.returncode == 0
    report = pytest.TestReport(
        nodeid=item.nodeid,
        location=item.location,
        keywords={k: 1 for k in item.keywords},
        outcome="passed" if passed else "failed",
        longrepr=None if passed else (
            f"isolated subprocess exited rc={proc.returncode}\n"
            f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
        ),
        when="call",
        duration=duration,
    )
    ihook.pytest_runtest_logreport(report=report)
    ihook.pytest_runtest_logfinish(nodeid=item.nodeid, location=item.location)
    return True


@pytest.fixture
def rng():
    return np.random.default_rng(42)
