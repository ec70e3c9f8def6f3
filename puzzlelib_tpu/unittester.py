"""Test runner (reference: /root/reference/Unittester.py).

The reference walks the tree for colocated ``unittest()`` functions and runs
them under a NaN-poisoning debug allocator with gc leak checks.  Here the
colocated tests live in ``tests/`` as pytest files; this runner drives them
with the same debug tiers:

  * ``Config.debugAllocator`` poisons fresh ``gpuarray.empty`` allocations
    with NaN/INT_MAX so uninitialized reads blow up float comparisons;
  * ``jax_debug_nans`` turns silent NaNs into immediate errors (optional);
  * gc uncollectable-object reporting.

Reference parity (Unittester.py:13-45,114-172): a retry threshold reruns
failed tests (stochastic inits can fail a tolerance once without the op being
wrong), and a per-backend exclusion matrix records which files a backend
cannot run — here the single-chip TPU relay cannot host the 8-virtual-device
mesh suites, and its minutes-long remote compiles make the benchmark CLI
tests time out.

Usage: ``python -m puzzlelib_tpu.unittester [--backend cpu|tpu]
[--threshold N] [pytest args...]``
"""

import gc
import os
import sys


# capability matrix: test files a backend cannot run, with the reason
EXCLUDE = {
    "cpu": set(),
    "tpu": {
        "test_parallel.py",      # needs the 8-virtual-device CPU mesh
        "test_pipeline.py",      # shard_map over >=2 devices
        "test_seqparallel.py",   # shard_map over >=2 devices
        "test_moe.py",           # expert mesh over >=2 devices
        "test_benchmarks.py",    # CLI subprocess timeouts under remote compile
        "test_reference_parity.py",  # runs the reference's numpy CPU backend
    },
}

THRESHOLD = 3   # reruns of failed tests before declaring failure


def main(extraArgs=None):
    args = list(extraArgs) if extraArgs is not None else sys.argv[1:]

    backend, threshold = "cpu", THRESHOLD
    if "--backend" in args:
        i = args.index("--backend")
        backend = args[i + 1]
        del args[i:i + 2]
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = int(args[i + 1])
        del args[i:i + 2]

    if backend == "cpu":
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
    if backend == "cpu":
        Config.backend = Config.Backend.cpu
    Config.debugAllocator = True

    gc.set_debug(gc.DEBUG_UNCOLLECTABLE)

    import pytest

    testdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")

    skips = ["--ignore=%s" % os.path.join(testdir, name)
             for name in sorted(EXCLUDE.get(backend, ()))]

    if backend != "cpu":
        # a wedged TPU relay fails every remaining test with
        # FAILED_PRECONDITION (observed 2026-08-20: 75 environmental failures
        # after a mid-suite wedge) - bail fast and leave the window to a rerun
        # instead of logging an hour of the same backend error
        args = ["--maxfail=12"] + args

    code = pytest.main([testdir, "-q"] + skips + args)

    # retry tier: stochastic tolerances get `threshold` chances, matching the
    # reference's per-module retry loop
    def lastFailed():
        import json
        path = os.path.join(os.getcwd(), ".pytest_cache", "v", "cache", "lastfailed")
        try:
            with open(path) as f:
                return set(json.load(f))
        except Exception:
            return set()

    retried = set()
    attempt = 1
    while code not in (0, 5) and attempt < threshold:
        attempt += 1
        retried |= lastFailed()
        print("unittester: rerunning failed tests (attempt %d/%d)" % (attempt, threshold))
        code = pytest.main([testdir, "-q", "--last-failed"] + skips + args)

    if code in (0, 5) and retried:
        # a pass-on-retry can mask a genuinely intermittent regression, not
        # just a stochastic-tolerance miss — keep it visible
        print("unittester: WARNING — %d test(s) passed only on retry:" % len(retried))
        for name in sorted(retried):
            print("  retried: %s" % name)

    if gc.garbage:
        print("Uncollectable objects: %d" % len(gc.garbage))

    return code


if __name__ == "__main__":
    sys.exit(main())
