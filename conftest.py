"""Root conftest: force a virtual 8-device CPU mesh before JAX imports.

Sharding tests run on a host-platform mesh (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin ignores the JAX_PLATFORMS env var and grabs the remote
# TPU (every XLA compile then takes a ~30 s tunnel round trip).  Setting the
# config explicitly before any backend is initialized forces the local CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "bootstrap_e2e: full CKKS bootstrap refresh — hour-scale XLA "
        "compile on a single host core; opt in with GST_BOOTSTRAP_E2E=1 "
        "(tools/run_bootstrap_e2e.sh)",
    )
    config.addinivalue_line(
        "markers",
        "slow: minutes-scale single test (runs by default; deselect with "
        "-m 'not slow' for a quick sweep)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("GST_BOOTSTRAP_E2E") == "1":
        return
    skip = pytest.mark.skip(
        reason="hour-scale compile; set GST_BOOTSTRAP_E2E=1 to run"
    )
    for item in items:
        if "bootstrap_e2e" in item.keywords:
            item.add_marker(skip)
