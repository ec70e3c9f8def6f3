"""Benchmark harness CLIs must run end-to-end on the CPU oracle."""

import os
import subprocess
import sys

import pytest


# generous timeouts: the LeNet fused-step compile alone can take minutes on a
# loaded machine, and these tests often run while TPU benchmarks hog the host
def runCli(args, timeout=540):
    env = dict(os.environ, PUZZLE_BACKEND="cpu", JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, "-m"] + args, capture_output=True, text=True,
                          timeout=timeout, env=env)


def testNetspeedCli():
    r = runCli(["puzzlelib_tpu.benchmarks.netspeed", "--net", "lenet", "--batch", "4", "--iters", "2"])
    assert r.returncode == 0 and "images/sec" in r.stdout, r.stdout + r.stderr


def testGemmspeedCli():
    r = runCli(["puzzlelib_tpu.benchmarks.gemmspeed", "--sizes", "256", "--dtypes", "float32", "--iters", "2"])
    assert r.returncode == 0 and "TF/s" in r.stdout, r.stdout + r.stderr


def testBenchCli():
    env = dict(os.environ, PUZZLE_BACKEND="cpu", JAX_PLATFORMS="cpu",
               BENCH_BATCH="8", BENCH_STEPS="2")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                       capture_output=True, text=True, timeout=540, env=env)
    assert r.returncode == 0, r.stderr

    import json
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(line), line
