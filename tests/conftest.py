"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment pre-registers a tunneled TPU backend (axon) via
sitecustomize, which overrides JAX_PLATFORMS; tests must not run over the
tunnel, so we force the CPU platform through jax.config after import and
request 8 virtual host devices for sharding tests. Real-TPU benchmarking
happens in bench.py only.
"""

import os
import pathlib
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# persistent compile cache: decoder programs take minutes to build on the
# CPU backend and dominate suite time; cached recompiles are near-instant
from uwspr_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

REFERENCE_DIR = pathlib.Path("/root/reference")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_examples():
    d = REFERENCE_DIR / "examples"
    if not d.exists():
        pytest.skip("reference examples not available")
    return d
