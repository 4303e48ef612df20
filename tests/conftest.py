"""Test configuration: CPU backend with a virtual 8-device mesh, float64.

Golden-value parity tests against the reference's Altro.jl-derived numbers
(`test/ilqr/ilqr_test.cpp:196-204` etc.) need float64; sharding tests need
multiple devices, which we emulate on CPU.  The environment may have already
imported jax (site customization) with a TPU platform pinned, so we override
via jax.config before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
