"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first ``import jax`` anywhere in the test
process (SURVEY environment note: multi-chip hardware is unavailable;
sharding is validated on virtual CPU devices).
"""

import os
import pathlib

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")


@pytest.fixture
def data_dir():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA


@pytest.fixture
def simple_gfa(data_dir):
    return (data_dir / "simple.gfa").read_text()


@pytest.fixture
def lil_gfa(data_dir):
    return (data_dir / "lil.gfa").read_text()


@pytest.fixture
def drb1_gfa(data_dir):
    return (data_dir / "DRB1-3123.gfa").read_text()
