"""Benchmark + verify the transform-domain Winograd bwd-filter on the chip.

Compares against the production XLA batch-role-swapped conv (NHWC) at
ResNet/VGG body shapes.  Rates in DIRECT bwd-filter FLOPs.

Run: python tools/winofg_bench.py [bi...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache
from puzzlelib_tpu.ops import conv as opsconv
from puzzlelib_tpu.ops.pallas import winograd


def fence(x):
    return np.asarray(x.ravel()[:1])


def timeChain(fn, args, reps, iters=2):
    @jax.jit
    def chained(*args):
        acc = jnp.zeros((8, ), jnp.float32)
        for i in range(reps):
            out = fn(i, *args)
            acc += out.ravel()[:8].astype(jnp.float32)
        return acc

    t0 = time.time()
    fence(chained(*args))
    comp = time.time() - t0

    start = time.perf_counter()
    for _ in range(iters):
        out = chained(*args)
    fence(out)
    return (time.perf_counter() - start) / iters / reps, comp


def main():
    enableCompileCache()

    shapes = [
        ("r50-56", (32, 256, 56, 56), 256, 1),
        ("r50-28", (32, 512, 28, 28), 512, 1),
        ("vgg-112", (16, 128, 112, 112), 128, 1),
    ]

    biList = [int(a) for a in sys.argv[1:]] or [None]

    for name, xs, co, pad in shapes:
        n, c, h, wd = xs
        oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
        flops = 2.0 * n * co * oh * ow * c * 9
        reps = max(4, min(16, int(1.5e12 / flops)))

        kx, kg = jax.random.split(jax.random.key(1))
        xn = (jax.random.normal(kx, (n, h, wd, c), jnp.float32) * 0.3).astype(jnp.bfloat16)
        dyn = (jax.random.normal(kg, (n, oh, ow, co), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(xn)

        # f32 oracle on chip via the XLA dense formulation
        x4 = xn.transpose(0, 3, 1, 2).astype(jnp.float32)
        dy4 = dyn.transpose(0, 3, 1, 2).astype(jnp.float32)
        ref = opsconv._filterGradDense(x4, dy4, (3, 3), (1, 1), (pad, pad), (1, 1))

        for bi in biList:
            try:
                got = winograd.filterGradNHWC(xn, dyn, (pad, pad), bi=bi)
            except Exception as exc:
                print("%-8s bi=%s FAILED: %s" % (name, bi, str(exc)[:300]))
                continue

            err = float(jnp.abs(got - ref).max())
            scale = float(jnp.abs(ref).max())
            tag = "bi=%s" % (bi if bi is not None else "auto")
            print("%-8s %-8s rel err %.2e" % (name, tag, err / scale))

            if err / scale > 5e-2:
                print("  MISMATCH - skipping timing")
                continue

            def wino(i, x, dy, bi=bi):
                return winograd.filterGradNHWC(
                    x, dy + jnp.bfloat16(i * 2 ** -10), (pad, pad), bi=bi)

            sec, comp = timeChain(wino, (xn, dyn), reps)
            print("  winoFG  %9.1f us  %7.2f TF/s-direct (%4.1f%% peak)  [compile %.0fs]"
                  % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))

        xb = xn.transpose(0, 3, 1, 2)
        dyb = dyn.transpose(0, 3, 1, 2)

        def direct(i, x, dy):
            return opsconv._filterGradDenseNhwc(
                x, dy + jnp.bfloat16(i * 2 ** -10), (3, 3), (1, 1),
                (pad, pad), (1, 1))

        sec, comp = timeChain(direct, (xb, dyb), reps)
        print("  xla-fg  %9.1f us  %7.2f TF/s (%4.1f%% peak)  [compile %.0fs]"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))


if __name__ == "__main__":
    main()
