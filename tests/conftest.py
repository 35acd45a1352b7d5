"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests without TPUs) and enable x64 so float64 golden parity is testable."""

import os

# The harness environment pins JAX_PLATFORMS=axon (the tunneled TPU) and its
# sitecustomize imports jax at interpreter start, so plain env vars are too
# late; override through jax.config before any backend initializes. Tests run
# on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
