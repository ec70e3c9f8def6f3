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


def testEnginespeedCli():
    r = runCli(["puzzlelib_tpu.benchmarks.enginespeed", "--net", "lenet", "--batch", "4",
                "--dtypes", "float32,int8", "--many", "2", "--iters", "2"])
    assert r.returncode == 0 and r.stdout.count("img/s") >= 2, r.stdout + r.stderr


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


def testTimingHelpers():
    """scanChain computes the right value; marginalTime returns a sane
    positive per-op time on CPU."""
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from puzzlelib_tpu.benchmarks.timing import scanChain, marginalTime, deltaBank

    x = jnp.asarray(np.arange(16.0, dtype=np.float32))

    def fn(i, x):
        return x + i.astype(jnp.float32)

    out = float(scanChain(fn, 4)(x))
    assert out == sum(15.0 + i for i in range(4)), out

    d = deltaBank((4, ), jnp.float32, 8)
    assert d.shape == (8, 4)

    sec = marginalTime(lambda i, x, d: (x + d[i % 8] @ jnp.ones((4, )))
                       .reshape(16),
                       (x.reshape(4, 4)[:, :1] * jnp.ones((4, 4)), d),
                       reps1=2, reps2=6, k=2)
    assert np.isfinite(sec)
