"""Stage breakdown for the conv3 kernel: layout pre-pass vs kernel vs exit.

Run: python tools/conv3_breakdown.py [nrows...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache
from puzzlelib_tpu.ops.pallas import conv3


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

    fence(chained(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = chained(*args)
    fence(out)
    return (time.perf_counter() - start) / iters / reps


def main():
    enableCompileCache()

    n, c, h, wd, co, p = 32, 256, 56, 56, 256, 1
    kh = kw = 3
    oh, ow = h + 2 * p - 2, wd + 2 * p - 2
    flops = 2.0 * n * co * oh * ow * c * 9
    reps = 12

    kx, kwt = jax.random.split(jax.random.key(0))
    x = (jax.random.normal(kx, (n, c, h, wd), jnp.float32) * 0.1).astype(jnp.bfloat16)
    w = (jax.random.normal(kwt, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
    fence(x)

    wp = conv3._subBlock(wd, p)

    for nrows in [int(a) for a in sys.argv[1:]] or [None]:
        nr = nrows or conv3._pickRows(c, co, kh, kw, oh, 2)
        nTiles = -(-oh // nr)

        # stage 1: toLayout + row pad + kw-shift stack (vary x to defeat CSE)
        def stage1(i, x):
            xT, g, hp = conv3.toLayout(x + jnp.bfloat16(i * 2 ** -8), (p, p), wp)
            rowsNeeded = nTiles * nr + kh - 1
            if hp < rowsNeeded:
                xT = jnp.pad(xT, ((0, 0), (0, (rowsNeeded - hp) * c), (0, 0)))
            xT = jnp.pad(xT, ((0, 0), (0, 0), (0, kw - 1)))
            return jnp.stack([xT[:, :, dx:dx + conv3.LANES] for dx in range(kw)])

        s1 = timeChain(stage1, (x, ), reps)

        # build the operand once for stage 2/3
        xS = jax.jit(lambda x: stage1(0, x))(x)
        wk = w.transpose(3, 0, 2, 1).reshape(kw, co, kh * c)
        fence(xS)

        # stage 2: kernel only (vary the filter; x stack hoisted by CSE)
        def stage2(i, xS, wk):
            return conv3._convHC(xS, wk + jnp.bfloat16(i * 2 ** -8), kh=kh, kw=kw,
                                 c=c, co=co, nrows=nr, nTiles=nTiles)

        s2 = timeChain(stage2, (xS, wk), reps)

        # stage 3: fromLayout (vary operand)
        out = jax.jit(lambda xS, wk: stage2(0, xS, wk))(xS, wk)
        g = conv3.LANES // wp
        fence(out)

        def stage3(i, out):
            return conv3.fromLayout(out + jnp.bfloat16(i * 2 ** -8), n, co, oh, ow, g, wp)

        s3 = timeChain(stage3, (out, ), reps)

        kernTF = flops / s2 / 1e12
        print("nrows=%-3d stack %7.1f us | kernel %7.1f us (%6.2f TF/s, %4.1f%% peak) "
              "| exit %7.1f us | sum %7.1f us (%6.2f TF/s)"
              % (nr, s1 * 1e6, s2 * 1e6, kernTF, kernTF / 1.97, s3 * 1e6,
                 (s1 + s2 + s3) * 1e6, flops / (s1 + s2 + s3) / 1e12))


if __name__ == "__main__":
    main()
