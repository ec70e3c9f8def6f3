"""Clean chip rooflines with a narrowing-proof consumer.

The chained-bench consumer ``acc += out.ravel()[:8]`` lets XLA *narrow*
dot_generals (slice-through-dot strength reduction): the int8 probe reported
11x the hardware peak.  Every rate here consumes ``jnp.max(out)`` instead -
max cannot be pushed through a contraction, so the full result must exist.

Measures: copy/elementwise BW, transpose BW, bf16/int8 GEMM rates,
XLA direct 3x3 conv at ResNet body shapes.

Run: python tools/roofline_probe.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache


def fence(x):
    return np.asarray(x.ravel()[:1])


def timeChain(fn, args, reps, iters=2):
    """Chain reps inside one program; consume each rep with max()."""
    @jax.jit
    def chained(*args):
        acc = jnp.zeros((), jnp.float32)
        for i in range(reps):
            out = fn(i, *args)
            acc += jnp.max(out).astype(jnp.float32)
        return acc

    fence(chained(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = chained(*args)
    fence(out)
    return (time.perf_counter() - start) / iters / reps


def main():
    enableCompileCache()

    k1, k2 = jax.random.split(jax.random.key(0))

    # -- streaming bandwidth -------------------------------------------------
    x = (jax.random.normal(k1, (64 * 2 ** 20, ), jnp.float32)).astype(jnp.bfloat16)
    fence(x)
    mb = x.size * 2 / 2 ** 20

    sec = timeChain(lambda i, x: x + jnp.bfloat16(i + 1), (x, ), reps=8)
    print("copy(+1)     %8.1f us  %7.1f GB/s (r+w %d MB)" % (sec * 1e6, 2 * mb / 1024 / sec, 2 * mb))

    xt = x[:32 * 256 * 56 * 56].reshape(32, 256, 56, 56)
    sec = timeChain(lambda i, xt: (xt + jnp.bfloat16(i + 1)).transpose(0, 2, 3, 1), (xt, ))
    # add-copy included; transpose share = measured - copy time
    print("nchw->nhwc   %8.1f us  (includes one +1 copy)" % (sec * 1e6, ))

    # true HBM bandwidth, free of XLA fusion games: a Pallas streaming copy
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = x.size // 512

    def copyKernel(xr, yr):
        yr[...] = xr[...] + jnp.bfloat16(1)

    def pallasCopy(i, x):
        blk = 4096
        return pl.pallas_call(
            copyKernel,
            grid=(rows // blk, ),
            in_specs=[pl.BlockSpec((blk, 512), lambda r: (r, 0))],
            out_specs=pl.BlockSpec((blk, 512), lambda r: (r, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 512), jnp.bfloat16),
        )((x + jnp.bfloat16(i)).reshape(rows, 512))

    sec = timeChain(pallasCopy, (x, ), reps=4)
    print("pallas-copy  %8.1f us  %7.1f GB/s (r+w %d MB, incl one +i copy)"
          % (sec * 1e6, 4 * mb / 1024 / sec, 4 * mb))

    # -- GEMM rates ----------------------------------------------------------
    for m, k, n in ((4096, 4096, 4096), (8192, 8192, 8192)):
        a = (jax.random.normal(k1, (m, k), jnp.float32) * 0.1).astype(jnp.bfloat16)
        b = (jax.random.normal(k2, (k, n), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(a)
        flops = 2.0 * m * k * n
        reps = max(4, int(1.5e12 / flops))

        sec = timeChain(
            lambda i, a, b: jnp.dot(a + jnp.bfloat16(i * 2 ** -8), b,
                                    preferred_element_type=jnp.float32),
            (a, b), reps)
        print("bf16 %dx%dx%d  %8.1f us  %7.2f TF/s (%5.1f%% of 197)"
              % (m, k, n, sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100))

        ai = jax.random.randint(k1, (m, k), -127, 127, jnp.int8)
        bi = jax.random.randint(k2, (k, n), -127, 127, jnp.int8)
        fence(ai)

        sec = timeChain(
            lambda i, ai, bi: lax.dot_general(ai ^ jnp.int8(i + 1), bi,
                                              (((1, ), (0, )), ((), ())),
                                              preferred_element_type=jnp.int32),
            (ai, bi), reps)
        print("int8 %dx%dx%d  %8.1f us  %7.2f TOP/s (%5.1f%% of 394)"
              % (m, k, n, sec * 1e6, flops / sec / 1e12, flops / sec / 394e12 * 100))

    # -- XLA direct 3x3 convs (NHWC) ----------------------------------------
    for name, (n, c, h, wd), co in (
            ("r50-56", (32, 256, 56, 56), 256),
            ("r50-28", (32, 512, 28, 28), 512)):
        xl = (jax.random.normal(k1, (n, h, wd, c), jnp.float32) * 0.1).astype(jnp.bfloat16)
        wt = (jax.random.normal(k2, (3, 3, c, co), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(xl)
        flops = 2.0 * n * co * h * wd * c * 9
        reps = max(4, min(16, int(1.5e12 / flops)))

        def conv(i, xl, wt):
            return lax.conv_general_dilated(
                xl, wt + jnp.bfloat16(i * 2 ** -8), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        sec = timeChain(conv, (xl, wt), reps)
        print("conv %-7s %8.1f us  %7.2f TF/s (%5.1f%% of 197)"
              % (name, sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100))


if __name__ == "__main__":
    main()
