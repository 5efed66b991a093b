"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU runs use bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon (remote TPU) plugin overrides jax_platforms at
# registration; force CPU selection for the test suite regardless.
jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE


@pytest.fixture(scope="session")
def era5_utm_fixture(reference_dir) -> pathlib.Path:
    path = reference_dir / "tests" / "data" / "era5_utm32_2025_05_01_00.nc"
    if not path.exists():
        pytest.skip("era5_utm32 fixture not available")
    return path
