"""Test configuration.

Unit tests run on CPU with 8 virtual XLA host devices so multi-chip sharding
code paths (mesh, shard_map, collective top-k merge) are exercised without a
TPU pod (SURVEY.md section 5, implication 4). Pallas kernels run in
interpreter mode on CPU; real-TPU parity and perf are covered by bench.py and
tpu-only scripts, which do NOT import this conftest.

The env vars must be set before the first ``import jax`` anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu";
# override it so the unit suite really runs on the 8-device virtual CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
