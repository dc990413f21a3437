"""Test harness: force an 8-device CPU topology before JAX initializes.

Multi-chip sharding behavior (dp/fsdp/tp meshes, collectives) is validated
on virtual CPU devices — the TPU answer to "test multi-node without a real
cluster" (SURVEY.md §4).
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS to the single
# real TPU chip (axon tunnel); tests must not contend for it. The backend
# resolves platforms lazily, so overriding here (before any jax op runs)
# reliably lands tests on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
