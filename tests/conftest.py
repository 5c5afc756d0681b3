"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
and kernels (interpret mode) are exercised without TPU hardware.

The axon sitecustomize pins jax to the TPU plugin via jax.config, so an env
var alone is not enough — override the config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"
