"""Test harness configuration.

Per SURVEY.md §4: tests run on the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware. The env vars
must be set before the first `import jax` anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's TPU plugin overrides JAX_PLATFORMS at import time;
# force CPU explicitly so tests never touch the (single, shared) real chip.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_data_dir(tmp_path):
    return tmp_path
