"""Stage breakdown + timing for the v2 winograd (strided-slice entry).

Times: entry only, entry+kernel (phase out), full fusedOut=False path,
and the XLA NHWC direct conv, at ResNet/VGG body shapes.

Run: python tools/winov2_breakdown.py
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


def entryOnly(x, pad, bi):
    n, h, wd, c = x.shape
    oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
    th, tw = -(-oh // 2), -(-ow // 2)
    twp = tw + 1

    nBlocks = -(-th // bi)
    hp2 = nBlocks * bi + 2
    xl = jnp.pad(x, ((0, 0), (pad, 2 * hp2 - h - pad),
                     (pad, 2 * twp - wd - pad), (0, 0)))
    rowsNeeded = (nBlocks - 1) * bi * twp + winograd._fetchRows(bi, twp)
    return winograd._rowSlabs(xl, n, hp2, twp, c, rowsNeeded)


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
        th, tw = -(-oh // 2), -(-ow // 2)
        twp = tw + 1
        cb = winograd._chunkC(c)
        flops = 2.0 * n * co * oh * ow * c * 9
        reps = max(4, min(16, int(1.5e12 / flops)))

        bi = winograd._pickBlock(th, twp, c, cb, co, 2)
        nBlocks = -(-th // bi)
        print("%s: bi=%d nBlocks=%d twp=%d mb=%d" % (name, bi, nBlocks, twp, bi * twp))

        kx, kw_ = jax.random.split(jax.random.key(0))
        xn = (jax.random.normal(kx, (n, h, wd, c), jnp.float32) * 0.3).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(xn)

        # correctness of the full path vs XLA f32
        ref = lax.conv_general_dilated(
            xn.astype(jnp.float32), w.astype(jnp.float32).transpose(2, 3, 1, 0),
            (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = winograd.conv2dNHWC(xn, w, (pad, pad), bi=bi)
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        scale = float(jnp.abs(ref).max())
        print("  rel err %.2e" % (err / scale))
        if err / scale > 5e-2:
            print("  MISMATCH - skipping")
            continue

        sec, comp = timeChain(
            lambda i, x: entryOnly(x + jnp.bfloat16(i * 2 ** -8), pad, bi),
            (xn, ), reps)
        print("  entry     %9.1f us  [compile %.0fs]" % (sec * 1e6, comp))

        u = winograd._filterTransform(w)
        xs = entryOnly(xn, pad, bi)
        fence(xs)

        def kern(i, xs, u):
            return winograd._winogradHC(
                xs + jnp.bfloat16(i * 2 ** -8), u, bi=bi, twp=twp, cb=cb,
                co=co, nBlocks=nBlocks, nCc=c // cb)

        sec, comp = timeChain(kern, (xs, u), reps)
        print("  kernel    %9.1f us  %7.2f TF/s-direct  [compile %.0fs]"
              % (sec * 1e6, flops / sec / 1e12, comp))

        def full(i, x, w):
            return winograd.conv2dNHWC(x, w + jnp.bfloat16(i * 2 ** -8),
                                       (pad, pad), bi=bi)

        sec, comp = timeChain(full, (xn, w), reps)
        print("  full      %9.1f us  %7.2f TF/s-direct (%4.1f%% peak)  [compile %.0fs]"
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
