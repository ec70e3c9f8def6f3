"""Do the NCHW↔NHWC transposes cancel between adjacent convs inside one
traced program?

Times three fused two-conv chains at one shape (scan-chained marginals):

  ours      convNd -> relu -> convNd      (NCHW API; each convNd internally
            transposes to NHWC and back - cancellation is XLA's job)
  pure      NHWC conv -> relu -> NHWC conv with a single NCHW->NHWC transpose
            at entry (what perfect cancellation would leave)
  nhwcio    pure chain with NHWC operands end to end (no entry transpose)

ours ≈ pure means XLA cancels the sandwiched transposes; ours >> pure means
every conv pays the ~200 MB relayout twice and the layout policy must move
up to the net level.

Run: python tools/chain2_probe.py --shape 32,64,112,112 --co 128
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="32,64,112,112")
    ap.add_argument("--co", type=int, default=128)
    ap.add_argument("--reps", default="4,12")
    args = ap.parse_args()

    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    from puzzlelib_tpu.benchmarks.timing import deltaBank, marginalTime
    from puzzlelib_tpu.ops import conv as convOps

    n, c, h, w = [int(x) for x in args.shape.split(",")]
    co = args.co
    r1, r2 = [int(x) for x in args.reps.split(",")]

    key = jax.random.key(0)
    x = (jax.random.normal(key, (n, c, h, w), jnp.float32) * 0.3).astype(jnp.bfloat16)
    w1 = (jax.random.normal(key, (co, c, 3, 3), jnp.float32) * 0.05).astype(jnp.bfloat16)
    w2 = (jax.random.normal(key, (co, co, 3, 3), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b1 = jnp.zeros((co, ), jnp.float32)
    b2 = jnp.zeros((co, ), jnp.float32)

    stride, pad, dil = (1, 1), (1, 1), (1, 1)
    rows = 8
    deltas = deltaBank((rows, ) + x.shape[2:], x.dtype, r2)

    def ours(xi):
        y = convOps.convNd(xi, w1, b1, stride, pad, dil, 1, hasBias=True)
        a = jnp.maximum(y.astype(jnp.float32), 0.0).astype(y.dtype)
        z = convOps.convNd(a, w2, b2, stride, pad, dil, 1, hasBias=True)
        return jnp.max(z.astype(jnp.float32)).reshape(1)

    w1l = jnp.transpose(w1, (2, 3, 1, 0))      # HWIO
    w2l = jnp.transpose(w2, (2, 3, 1, 0))

    def nhwcConv(xl, wl, bl):
        out = lax.conv_general_dilated(
            xl, wl, stride, [(p, p) for p in pad],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(out + bl, 0.0).astype(xl.dtype)

    def pure(xi):
        xl = jnp.transpose(xi, (0, 2, 3, 1))
        a = nhwcConv(xl, w1l, b1)
        z = nhwcConv(a, w2l, b2)
        return jnp.max(z.astype(jnp.float32)).reshape(1)

    xNhwc = jnp.transpose(x, (0, 2, 3, 1))
    deltasNhwc = deltaBank((rows, ) + xNhwc.shape[2:], x.dtype, r2, seed=9)

    def nhwcio(xl):
        a = nhwcConv(xl, w1l, b1)
        z = nhwcConv(a, w2l, b2)
        return jnp.max(z.astype(jnp.float32)).reshape(1)

    flops = 2.0 * n * h * w * 9 * (c * co + co * co)
    print("two-conv ideal: %.1f us" % (flops / 197e12 * 1e6), flush=True)

    for label, fn, ops in (
        ("ours(NCHW api)", ours, (x, deltas)),
        ("pure(1 entry transpose)", pure, (x, deltas)),
        ("nhwc io", nhwcio, (xNhwc, deltasNhwc)),
    ):
        def step(i, xx, d):
            return fn(xx.at[:, :rows].add(d[i]))

        secs = marginalTime(step, ops, reps1=r1, reps2=r2, k=3)
        print("%-26s %9.1f us" % (label, secs * 1e6), flush=True)


if __name__ == "__main__":
    main()
