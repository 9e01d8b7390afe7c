"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX trick is to
split the host CPU into 8 virtual devices so every sharding/collective path
compiles and runs exactly as it would on an 8-chip slice.
"""

import os

# NB: the environment exports JAX_PLATFORMS=axon (the TPU tunnel); overriding
# the env var is not enough because the plugin re-appends itself, so the
# config is also updated after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
