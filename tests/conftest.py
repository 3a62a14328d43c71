"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so multi-chip sharding
(`jax.sharding.Mesh`) is exercised without TPU hardware, per the driver's
contract. Golden parity tests compare against PyTorch (CPU) directly.
"""

import os

# Must be set before jax is imported anywhere. Force (not setdefault): the
# session environment may point JAX_PLATFORMS at a tunneled TPU, but the test
# suite always runs on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers a tunneled TPU ("axon") backend at
# interpreter start; the config update below overrides it even then.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
