"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding code paths are exercised without TPU hardware.

This must FORCE the platform (not setdefault): the container's axon
sitecustomize exports JAX_PLATFORMS=axon, and a suite silently running over
the TPU tunnel is both slow and wrong for the multichip tests (they need
the 8 virtual CPU devices). Kernels under test run with interpret=True /
the binned_xla backend on CPU; TPU-real execution is covered by bench.py
and the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The sitecustomize imports jax at interpreter startup, capturing
# JAX_PLATFORMS=axon into jax's config before this file runs — the env var
# alone is too late. Backends are not yet initialized at conftest time, so
# the config update still takes effect.
import jax

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "test suite must run on the virtual-CPU platform; got "
        f"{jax.default_backend()} (JAX initialized before conftest?)"
    )
    assert len(jax.devices()) >= 8, jax.devices()
