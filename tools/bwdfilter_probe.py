"""Probe conv bwd-filter formulations on chip.

Formulations compared per shape (all f32-accumulated, bf16 operands):
  conv  - the production _filterGrad (batch-role-swapped conv, NHWC)
  taps  - one dot_general per filter tap: dW[:,:,r,s] = dy . x[shifted],
          contraction over (n, oh, ow); only sane for small kernels
Run: python tools/bwdfilter_probe.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache
from puzzlelib_tpu.ops import conv as opsconv


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


def tapsGrad(x, dy, kh, kw, pad):
    """dW[o,c,r,s] = sum_{n,i,j} dy[n,o,i,j] xpad[n,c,i+r,j+s] via kh*kw dots.

    NHWC operands so the contraction (n*oh*ow) is the sublane/lane-friendly
    major axis and channels ride the lanes."""
    n, c, h, w = x.shape
    co, oh, ow = dy.shape[1], dy.shape[2], dy.shape[3]

    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    xl = xp.transpose(0, 2, 3, 1)                  # N, HP, WP, C
    dyl = dy.transpose(0, 2, 3, 1).reshape(n * oh * ow, co)

    taps = []
    for r in range(kh):
        for s in range(kw):
            sl = xl[:, r:r + oh, s:s + ow, :].reshape(n * oh * ow, c)
            taps.append(jax.lax.dot_general(
                dyl, sl, (((0, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32))    # (CO, C)

    dw = jnp.stack(taps).reshape(kh, kw, co, c)
    return dw.transpose(2, 3, 0, 1)


def main():
    enableCompileCache()

    shapes = [
        ("r50-56 3x3", (32, 256, 56, 56), (256, 256, 3, 3), 1),
        ("r50-28 3x3", (32, 512, 28, 28), (512, 512, 3, 3), 1),
        ("convspeed 11x11", (128, 32, 64, 64), (64, 32, 11, 11), 0),
    ]

    for name, xs, ws, pad in shapes:
        n, c, h, wd = xs
        co, _, kh, kw = ws
        oh, ow = h + 2 * pad - kh + 1, wd + 2 * pad - kw + 1
        flops = 2.0 * n * co * oh * ow * c * kh * kw
        reps = max(4, min(16, int(1.5e12 / flops)))

        kx, kg = jax.random.split(jax.random.key(1))
        x = (jax.random.normal(kx, xs, jnp.float32) * 0.1).astype(jnp.bfloat16)
        dy = (jax.random.normal(kg, (n, co, oh, ow), jnp.float32) * 0.1).astype(jnp.bfloat16)
        wt = jnp.zeros(ws, jnp.bfloat16)
        fence(x)

        def convForm(i, x, dy, wt):
            dw, _ = opsconv.convNdBackwardParams(
                x, dy + jnp.bfloat16(i * 2 ** -8), wt,
                (1, 1), (pad, pad), (1, 1), 1, False)
            return dw

        sec = timeChain(convForm, (x, dy, wt), reps)
        print("%-16s conv  %9.1f us  %7.2f TF/s (%4.1f%% peak)"
              % (name, sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100))

        if kh * kw <= 9:
            def tapForm(i, x, dy):
                return tapsGrad(x, dy + jnp.bfloat16(i * 2 ** -8), kh, kw, pad)

            # correctness first
            got = jax.jit(lambda x, dy: tapForm(0, x, dy))(x, dy)
            ref = jax.jit(lambda x, dy: convForm(0, x, dy, wt.astype(jnp.float32)))(x, dy)
            err = float(jnp.abs(got - ref.astype(jnp.float32)).max())
            scale = float(jnp.abs(ref).max())

            sec = timeChain(tapForm, (x, dy), reps)
            print("%-16s taps  %9.1f us  %7.2f TF/s (%4.1f%% peak)  rel err %.1e"
                  % (name, sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100,
                     err / scale))


if __name__ == "__main__":
    main()
