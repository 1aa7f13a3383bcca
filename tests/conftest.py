"""Test configuration: run JAX on CPU with 8 virtual devices.

Distributed tests use the standard JAX trick of faking a mesh on host CPU
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so sharding semantics
are validated without pod hardware.

Real-TPU regression tests (tests/test_tpu_regression.py) opt OUT of the CPU
forcing: run ``RTNR_TPU_TESTS=1 python -m pytest tests -m tpu`` on a machine
with the chip to exercise the production numeric path and its perf floors
(everything else deselects under ``-m tpu``).
"""

import os

import pytest

_TPU_MODE = os.environ.get("RTNR_TPU_TESTS") == "1"

if not _TPU_MODE:
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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: requires a real TPU chip (run with RTNR_TPU_TESTS=1 -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="TPU-only regression test (set RTNR_TPU_TESTS=1 and run -m tpu)"
    )
    for item in items:
        if "tpu" in item.keywords and not _TPU_MODE:
            item.add_marker(skip_tpu)
