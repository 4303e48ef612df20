"""Test configuration: CPU backend with a virtual 8-device mesh, float64.

Golden-value parity tests against the reference's Altro.jl-derived numbers
(`test/ilqr/ilqr_test.cpp:196-204` etc.) need float64; sharding tests need
multiple devices, which we emulate on CPU.  The environment may have already
imported jax (site customization) with a TPU platform pinned, so we override
via jax.config before any backend initializes.

CONCURRENCY HAZARD (observed r3): when the axon sitecustomize is on
PYTHONPATH, even a CPU-pinned pytest process registers the TPU plugin at
interpreter start; two axon-registered processes interfere through the
tunnel and can corrupt each other (one full-suite run produced a spurious
NaN failure in test_quadrotor_waypoint while a TPU bench ran concurrently —
unreproducible in a clean environment, 162/162 green).  Run the suite with
`PYTHONPATH=/root/repo` (axon_site dropped) if anything TPU-side may be
running.
"""
import os

# ALTRO_TPU_TESTS=1 leaves the real backend in place so the tpu-marked
# modules (tests/test_tpu_compiled.py) can exercise the compiled kernels:
#   ALTRO_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q
_TPU_MODE = os.environ.get("ALTRO_TPU_TESTS", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the process's accumulated XLA state.

    The suite compiles several hundred programs, some large (B=1024
    interpret-mode Pallas solves); without clearing, the single-process run
    aborts inside XLA's CPU compiler near the end of the suite (SIGABRT in
    backend_compile_and_load, observed r3).  Dropping compiled executables
    between modules keeps peak memory flat; modules re-compile what they
    share (cached fixtures within a module are unaffected).
    """
    yield
    jax.clear_caches()
