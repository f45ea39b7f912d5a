"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
import so multi-chip sharding paths are exercised without TPU hardware."""
import os
import sys

_platform = os.environ.get("CFGAN_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already be imported (site customization), in which case its config
# snapshotted the original env — override through the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def moons_data():
    from cfgan.data.moons import load_moons3

    return load_moons3(seed=42)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: heavier compile-time tests")
