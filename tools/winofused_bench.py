"""Benchmark + verify the fused Winograd kernel (new IO scheme) on the chip.

Times the NHWC->NHWC core (what the production dispatch wraps) against the
XLA NHWC direct conv at ResNet/VGG body shapes.  Rates in DIRECT-conv FLOPs.

Run: python tools/winofused_bench.py [bi...]
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

        kx, kw_ = jax.random.split(jax.random.key(0))
        xn = (jax.random.normal(kx, (n, h, wd, c), jnp.float32) * 0.3).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(xn)

        ref = lax.conv_general_dilated(
            xn.astype(jnp.float32), w.astype(jnp.float32).transpose(2, 3, 1, 0),
            (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

        for bi in biList:
            try:
                got = winograd.conv2dNHWC(xn, w, (pad, pad), bi=bi)
            except Exception as exc:
                print("%-8s bi=%s FAILED: %s" % (name, bi, str(exc)[:300]))
                continue

            err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
            scale = float(jnp.abs(ref).max())
            tag = "bi=%s" % (bi if bi is not None else "auto")
            print("%-8s %-8s rel err %.2e" % (name, tag, err / scale))

            if err / scale > 5e-2:
                print("  MISMATCH - skipping timing")
                continue

            def wino(i, x, w, bi=bi):
                return winograd.conv2dNHWC(x, w + jnp.bfloat16(i * 2 ** -8),
                                           (pad, pad), bi=bi)

            sec, comp = timeChain(wino, (xn, w), reps)
            print("  winofused %9.1f us  %7.2f TF/s-direct (%4.1f%% peak)  [compile %.0fs]"
                  % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))

        def direct(i, x, w):
            out = lax.conv_general_dilated(
                x, (w + jnp.bfloat16(i * 2 ** -8)).transpose(2, 3, 1, 0),
                (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return out.astype(x.dtype)

        sec, comp = timeChain(direct, (xn, w), reps)
        print("  xla-nhwc  %9.1f us  %7.2f TF/s (%4.1f%% peak)  [compile %.0fs]"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))


if __name__ == "__main__":
    main()
