"""Robust marginal timing: min-of-k fenced single calls, wide rep spread.

The relay's fixed per-call cost varies 10-19 ms between runs; min-of-k
stabilises it at its floor, and differencing reps 8 vs 40 cancels it.

Run: python tools/convfinal_bench.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache
from puzzlelib_tpu.ops.pallas import winograd


def fence(x):
    return np.asarray(x.ravel()[:1])


def minTime(f, args, k=5):
    best = float("inf")
    for _ in range(k):
        t = time.perf_counter()
        fence(f(*args))
        best = min(best, time.perf_counter() - t)
    return best


def marginal(fn, args, reps1=8, reps2=40):
    def make(reps):
        @jax.jit
        def chained(*args):
            acc = jnp.zeros((), jnp.float32)
            for i in range(reps):
                acc += jnp.max(fn(i, *args).astype(jnp.float32))
            return acc
        return chained

    f1, f2 = make(reps1), make(reps2)
    fence(f1(*args)); fence(f2(*args))         # compile

    t1, t2 = minTime(f1, args), minTime(f2, args)
    return (t2 - t1) / (reps2 - reps1)


def main():
    enableCompileCache()

    shapes = [
        ("r50-56", (32, 256, 56, 56), 256, 1),
        ("r50-28", (32, 512, 28, 28), 512, 1),
        ("vgg-112", (16, 128, 112, 112), 128, 1),
    ]

    for name, xsh, co, pad in shapes:
        n, c, h, wd = xsh
        oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
        flops = 2.0 * n * co * oh * ow * c * 9

        kx, kw_ = jax.random.split(jax.random.key(0))
        xn = (jax.random.normal(kx, (n, h, wd, c), jnp.float32) * 0.3).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        deltas = (jax.random.normal(jax.random.key(7), (48,) + w.shape,
                                    jnp.float32) * 0.01).astype(jnp.bfloat16)
        fence(xn); fence(deltas)

        def wino(i, x, w, deltas):
            return winograd.conv2dNHWC(x, w + deltas[i], (pad, pad), scheme="rmw")

        sec = marginal(wino, (xn, w, deltas))
        print("%-8s wino-rmw %8.1f us  %7.2f TF/s-direct (%5.1f%% peak)"
              % (name, sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100),
              flush=True)

        def direct(i, x, w, deltas):
            out = lax.conv_general_dilated(
                x, (w + deltas[i]).transpose(2, 3, 1, 0),
                (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return out.astype(x.dtype)

        sec = marginal(direct, (xn, w, deltas))
        print("%-8s xla-nhwc %8.1f us  %7.2f TF/s (%5.1f%% peak)"
              % (name, sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100),
              flush=True)


if __name__ == "__main__":
    main()
