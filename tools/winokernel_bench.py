"""On-chip bench of the fused Winograd Pallas kernel, with stage breakdown.

All consumers are jnp.max (narrowing-proof).  Rates in DIRECT-conv FLOPs.

Run: python tools/winokernel_bench.py
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
        acc = jnp.zeros((), jnp.float32)
        for i in range(reps):
            out = fn(i, *args)
            acc += jnp.max(out).astype(jnp.float32)
        return acc

    t0 = time.time()
    fence(chained(*args))
    comp = time.time() - t0

    start = time.perf_counter()
    for _ in range(2):
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

    for name, xs_, co, pad in shapes:
        n, c, h, wd = xs_
        oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
        flops = 2.0 * n * co * oh * ow * c * 9
        reps = max(4, min(12, int(1.5e12 / flops)))

        kx, kw_ = jax.random.split(jax.random.key(0))
        x = (jax.random.normal(kx, xs_, jnp.float32) * 0.3).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(x)

        # correctness vs XLA f32 on chip
        ref = lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
            [(pad, pad), (pad, pad)], dimension_numbers=("NCHW", "OIHW", "NCHW"))
        got = winograd.conv2d(x, w, (pad, pad))
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        scale = float(jnp.abs(ref).max())
        print("%-8s rel err %.2e" % (name, err / scale))

        if err / scale > 5e-2:
            print("  MISMATCH - skipping timing")
            continue

        # full call
        sec, comp = timeChain(
            lambda i, x, w: winograd.conv2d(x, w + jnp.bfloat16(i * 2 ** -8), (pad, pad)),
            (x, w), reps)
        print("  full     %9.1f us  %7.2f TF/s-direct (%4.1f%% peak)  [compile %.0fs]"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))

        # stages
        th, tw = -(-oh // 2), -(-ow // 2)
        twp = tw + 1
        cb = winograd._chunkC(c)
        bi = winograd._pickBlock(th, twp, c, cb, co, 2)
        nBlocks = -(-th // bi)
        nCc = c // cb

        def entry(i, x):
            xv = x + jnp.bfloat16(i * 2 ** -8)
            hp = 2 * (nBlocks * bi + 1)
            wp = 2 * (twp + 1)
            xl = jnp.pad(xv.transpose(0, 2, 3, 1),
                         ((0, 0), (pad, hp - h - pad), (pad, wp - wd - pad), (0, 0)))
            t = xl.reshape(n, hp // 2, 2, wp // 2, 2, c)
            t = t.transpose(2, 4, 0, 1, 3, 5)[:, :, :, :, :twp, :]
            t = t.reshape(4, n, (hp // 2) * twp, c)
            return jnp.pad(t, ((0, 0), (0, 0), (0, 1), (0, 0)))

        s1, _ = timeChain(entry, (x, ), reps)

        xsOp = jax.jit(lambda x: entry(0, x))(x)
        u = jax.jit(winograd._filterTransform)(w)
        fence(xsOp)

        def kern(i, xsOp, u):
            return winograd._winogradHC(xsOp, u + jnp.bfloat16(0) * i, bi=bi, twp=twp,
                                        cb=cb, co=co, nBlocks=nBlocks, nCc=nCc)

        s2, _ = timeChain(kern, (xsOp, u), reps)

        outP = jax.jit(lambda a, b: kern(0, a, b))(xsOp, u)
        fence(outP)

        def exit_(i, outP):
            o = (outP + jnp.bfloat16(i * 2 ** -8)).reshape(n, nBlocks, 2, 2, bi, twp, co)
            o = o.transpose(0, 1, 4, 2, 5, 3, 6)
            o = o.reshape(n, nBlocks * bi * 2, twp * 2, co)[:, :oh, :ow, :]
            return o.transpose(0, 3, 1, 2)

        s3, _ = timeChain(exit_, (outP, ), reps)

        print("  entry %7.1f us | kernel %7.1f us (%6.2f TF/s-direct) | exit %7.1f us"
              % (s1 * 1e6, s2 * 1e6, flops / s2 / 1e12, s3 * 1e6))


if __name__ == "__main__":
    main()
