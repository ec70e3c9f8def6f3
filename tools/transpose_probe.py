"""Micro-probe: XLA layout-transform costs at the ResNet body shape.

The conv3 stage breakdown showed its entry/exit transforms cost 1.6/1.4 ms
for ~100 MB moved (~12x off HBM speed).  This times each candidate transform
in isolation so kernel designs can budget real numbers:

  nchw->nhwc   plain channel transpose (granule 2 B reads -> how bad?)
  nhwc->nchw   inverse
  s2d          NHWC space-to-depth 2x2 (granule C*2 B = 512 B, should fly)
  s2d-inv      inverse interleave
  conv3-in     conv3.toLayout + kw stack (the measured-slow one, for scale)

Run: python tools/transpose_probe.py
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


def timeChain(fn, args, reps=12, iters=2):
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

    n, c, h, wd = 32, 256, 56, 56
    mb = n * c * h * wd * 2 / 2 ** 20

    kx = jax.random.key(0)
    x = (jax.random.normal(kx, (n, c, h, wd), jnp.float32) * 0.1).astype(jnp.bfloat16)
    xl = jnp.asarray(x.transpose(0, 2, 3, 1))
    fence(x)

    def report(name, sec, mbMoved):
        print("%-10s %8.1f us  %7.1f GB/s effective (%.0f MB)"
              % (name, sec * 1e6, mbMoved / 1024 / sec, mbMoved))

    vary = lambda a, i: a + jnp.bfloat16(i * 2 ** -8)

    sec = timeChain(lambda i, x: vary(x, i).transpose(0, 2, 3, 1), (x, ))
    report("nchw->nhwc", sec, 2 * mb)

    sec = timeChain(lambda i, xl: vary(xl, i).transpose(0, 3, 1, 2), (xl, ))
    report("nhwc->nchw", sec, 2 * mb)

    # space-to-depth: NHWC (pad to even+2 halo) -> (2, 2, N, TH+1, TW+1, C)
    th = tw = 28

    def s2d(i, xl):
        xp = jnp.pad(vary(xl, i), ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jnp.stack([
            lax.slice(xp, (0, a, b, 0), (n, a + 2 * th + 1, b + 2 * tw + 1, c), (1, 2, 2, 1))
            for a in range(2) for b in range(2)
        ])

    sec = timeChain(s2d, (xl, ))
    report("s2d", sec, 2 * mb * (29 * 29) / (28 * 28))

    ph = jax.jit(lambda xl: s2d(0, xl))(xl)
    fence(ph)

    # inverse: phase stack (4, N, TH, TW, C) -> NHWC (N, 2TH, 2TW, C)
    def s2dInv(i, ph):
        p = vary(ph[:, :, :th, :tw, :], i).reshape(2, 2, n, th, tw, c)
        y = p.transpose(2, 3, 0, 4, 1, 5)             # N, TH, 2, TW, 2, C
        return y.reshape(n, 2 * th, 2 * tw, c)

    sec = timeChain(s2dInv, (ph, ))
    report("s2d-inv", sec, 2 * mb)

    from puzzlelib_tpu.ops.pallas import conv3
    wp = conv3._subBlock(wd, 1)

    def conv3In(i, x):
        xT, g, hp = conv3.toLayout(vary(x, i), (1, 1), wp)
        xT = jnp.pad(xT, ((0, 0), (0, 0), (0, 2)))
        return jnp.stack([xT[:, :, dx:dx + 128] for dx in range(3)])

    sec = timeChain(conv3In, (x, ))
    report("conv3-in", sec, 4 * mb)


if __name__ == "__main__":
    main()
