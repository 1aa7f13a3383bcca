"""Test configuration: run JAX on CPU with 8 virtual devices.

Distributed tests use the standard JAX trick of faking a mesh on host CPU
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so sharding semantics
are validated without pod hardware. Real-TPU runs go through bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force override: the environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel) via sitecustomize, which also does jax.config.update at
# registration time — so env vars alone are not enough; update the config.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
