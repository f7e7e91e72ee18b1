"""Test fixture: force an 8-device virtual CPU platform so sharding
logic (mesh/pjit) runs without real multi-chip hardware.

NB the sandbox presets JAX_PLATFORMS=axon (single tunneled TPU) and
some pytest plugin may import jax before this conftest, so we override
both the environment AND the live jax config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
