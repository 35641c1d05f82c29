"""Test harness config: force the CPU backend with 8 virtual devices so
sharded code paths (groupwise subject sharding) are exercised hermetically.

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via sitecustomize,
so plain env vars are not enough — override through jax.config before any
backend is initialised.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
