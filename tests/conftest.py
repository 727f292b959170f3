"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the experimental `axon` TPU
tunnel backend and forces ``jax_platforms="axon,cpu"`` via
``jax.config`` at interpreter start (so env vars alone cannot override
it).  Tests must never run over the tunnel: reset the config to cpu
right here, and request 8 virtual host devices before any backend
initializes (SURVEY environment note: multi-chip sharding is validated
on virtual CPU devices).
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# GFASORT_TEST_TPU=1 keeps the real backend so the TPU-gated
# real-kernel tests (test_sweep_dense.py -k real_kernel) can run on
# hardware; x64 must stay OFF there (Mosaic is 32-bit — i64 indices /
# returns fail verification).  Everything else runs on the virtual
# CPU mesh with x64 on (the f64 oracle tests need it).
if os.environ.get("GFASORT_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

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
