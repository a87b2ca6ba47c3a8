"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding tests use XLA's
host-platform device virtualization, mirroring how the driver validates the
multi-chip path (see __graft_entry__.dryrun_multichip).
"""

import os

# Force-override: the environment pins JAX_PLATFORMS=axon (the tunneled TPU
# chip) and its sitecustomize re-registers the axon backend regardless of the
# env var — go through jax.config, which wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
