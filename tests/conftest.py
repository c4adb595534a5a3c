"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (pjit/shard_map over the env axis) is validated on CPU with
XLA's host-platform device-count override, mirroring how the driver dry-runs the
multi-chip path. Real-TPU benchmarks happen separately via bench.py.

Note: the environment registers an 'axon' TPU PJRT plugin at interpreter start
and pins jax_platforms to it, so the env var alone is not enough — we override
through the config API before any computation runs.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# `-m fast` tier: quick physics/terrain/reward correctness modules that
# compile in seconds each — the pre-commit gate for hot-loop default changes
# (the expensive configurations are exactly the ones nobody re-runs).
_FAST_MODULES = {
    "test_quat", "test_dynamics", "test_soa", "test_scene", "test_terrain",
    "test_native", "test_camera",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1] if item.module else ""
        if mod in _FAST_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
