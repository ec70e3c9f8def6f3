"""Test runner (reference: /root/reference/Unittester.py).

The reference walks the tree for colocated ``unittest()`` functions and runs
them under a NaN-poisoning debug allocator with gc leak checks.  Here the
colocated tests live in ``tests/`` as pytest files; this runner drives them
with the same debug tiers:

  * ``Config.debugAllocator`` poisons fresh ``gpuarray.empty`` allocations
    with NaN/INT_MAX so uninitialized reads blow up float comparisons;
  * ``jax_debug_nans`` turns silent NaNs into immediate errors (optional);
  * gc uncollectable-object reporting.

Usage: ``python -m puzzlelib_tpu.unittester [pytest args...]``
"""

import gc
import os
import sys


def main(extraArgs=None):
    # force the CPU oracle explicitly: `python -m` imports the package (and
    # config reads PUZZLE_BACKEND) before this function runs, and the shell
    # may export JAX_PLATFORMS=axon — setdefault alone would silently leave
    # the tests running through the TPU relay (1 device, minutes per compile)
    os.environ["PUZZLE_BACKEND"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    from puzzlelib_tpu import config as Config
    Config.backend = Config.Backend.cpu
    Config.debugAllocator = True

    gc.set_debug(gc.DEBUG_UNCOLLECTABLE)

    import pytest

    testdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    args = [testdir, "-q"] + (extraArgs if extraArgs is not None else sys.argv[1:])

    code = pytest.main(args)

    if gc.garbage:
        print("Uncollectable objects: %d" % len(gc.garbage))

    return code


if __name__ == "__main__":
    sys.exit(main())
