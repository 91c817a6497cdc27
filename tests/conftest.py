"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit/integration tests use the
CPU backend so sharding logic is exercised on an 8-device virtual mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_DIR = pathlib.Path("/root/reference")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_examples():
    d = REFERENCE_DIR / "examples"
    if not d.exists():
        pytest.skip("reference examples not available")
    return d
