"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` — something the CUDA-only
reference could never do (its distributed paths were untestable without a
cluster; see SURVEY.md §4).
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS to the tunneled
# TPU, which is slow for unit tests and uses bf16 matmuls by default.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin force-appends itself to jax_platforms at import time;
# the config update (pre-backend-init) wins over it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
