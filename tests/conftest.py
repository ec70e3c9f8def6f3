"""Test harness: run on the JAX CPU platform with 8 virtual devices so
collective/sharding tests work without TPU hardware.  Set PUZZLE_TPU_TESTS=1
to exercise the real TPU instead."""

import os

if os.environ.get("PUZZLE_TPU_TESTS", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")

    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    os.environ.setdefault("PUZZLE_BACKEND", "cpu")

# initialize the platform override before any test-level jax usage (the axon
# plugin's sitecustomize forces jax_platforms="axon,cpu" at interpreter start)
from puzzlelib_tpu.backend import device as _device  # noqa: E402
_device.ensureInit()
