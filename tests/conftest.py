"""Test configuration: run on CPU with 8 virtual devices for sharding tests.

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize may have imported jax (axon TPU plugin)
# before this conftest ran, in which case the env var above is too late —
# force the platform through the config API as well.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", False)

# Persistent XLA compile cache: most of the suite's wall time is jit compiles
# of similar tiny models; re-runs on an unchanged jax version hit the disk
# cache (keyed by HLO hash — safe under code edits).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("ETQ_TEST_CACHE", "/tmp/etq_jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update(
        "jax_persistent_cache_enable_xla_caches", "all"
    )
except Exception:
    pass

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked @pytest.mark.slow",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test — deselected by default on this single-core "
        "box; enable with --runslow or ETQ_RUN_SLOW=1 (full pre-commit runs)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("ETQ_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow (use --runslow / ETQ_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
