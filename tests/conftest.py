"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/collective tests
run against XLA's host-platform device virtualization. Must run before the
first jax import anywhere.
"""
import os

# The environment's sitecustomize may have registered a remote-TPU backend and
# pinned JAX_PLATFORMS before this file runs; both the env var and the jax
# config must be forced back to CPU (backend init is lazy, so doing it here —
# before the first computation — is sufficient).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cpu_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("data",))
