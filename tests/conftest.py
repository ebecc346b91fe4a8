"""Test harness: run everything on an 8-device virtual CPU mesh.

This simulates the multi-chip topology (data x sp mesh) the real deployment
uses over ICI (SURVEY.md section 2.8 P10). Env vars alone are not enough:
site customization may import jax (and register accelerator plugins) before
pytest loads this file, so we also force the platform through jax.config,
which takes effect at (lazy) backend initialization.
"""

import os

# force (not setdefault): the ambient shell may carry JAX_PLATFORMS=axon,
# which subprocesses spawned by tests would inherit and then fail to
# register (the axon plugin needs PALLAS_AXON_POOL_IPS, stripped for tests)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_sessionstart(session):
    # Fail fast (and loudly) if the CPU mesh didn't come up.
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs[0]}"


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
