"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes its backends, hence the env
mutation at import time (conftest is imported before any test module).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: environments that pre-register a TPU
# proxy backend at interpreter startup also set the jax_platforms CONFIG,
# which wins over the env var. Forcing the config here keeps the whole
# suite on the virtual 8-device CPU mesh (and keeps compiles local/fast).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
