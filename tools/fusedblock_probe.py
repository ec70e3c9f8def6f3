"""Fused-block ablation probe: where does a conv block's train time go
INSIDE one traced program (the regime the eager per-layer profiler cannot
see, because XLA fuses/cancels across module boundaries there)?

Builds one fused program per ablation from the SAME explicit ops the Module
layer dispatches (ops.conv convNd/BackwardData/BackwardParams, ops.pool),
and times them with scan-chained rep-differenced marginals
(benchmarks.timing). Successive differences attribute the marginal cost of
each backward component in the fused regime:

  fwd                 conv + bias + relu
  +bwdData            + relu mask + explicit conv bwd-data
  +bwdFilter          + explicit conv bwd-filter (+ bias grad)
  +pool(scatter)      pool fwd/bwd via the reduce_window VJP (select-and-scatter)
  +pool(tiled)        pool fwd/bwd via the dispatching poolNd/poolNdBackward

Run: python tools/fusedblock_probe.py --shape 32,64,224,224 --co 64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="32,64,224,224")
    ap.add_argument("--co", type=int, default=64)
    ap.add_argument("--reps", default="4,12")
    args = ap.parse_args()

    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    from puzzlelib_tpu.benchmarks.timing import deltaBank, marginalTime
    from puzzlelib_tpu.ops import conv as convOps
    from puzzlelib_tpu.ops import pool as poolOps

    n, c, h, w = [int(x) for x in args.shape.split(",")]
    co = args.co
    r1, r2 = [int(x) for x in args.reps.split(",")]

    key = jax.random.key(0)
    x = (jax.random.normal(key, (n, c, h, w), jnp.float32) * 0.3).astype(jnp.bfloat16)
    wts = (jax.random.normal(key, (co, c, 3, 3), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((co, ), jnp.float32)

    rows = 8
    deltas = deltaBank((rows, ) + x.shape[2:], x.dtype, r2)

    stride, pad, dil = (1, 1), (1, 1), (1, 1)

    def convF(xi):
        return convOps.convNd(xi, wts, b, stride, pad, dil, 1, hasBias=True)

    def relu(y):
        return jnp.maximum(y.astype(jnp.float32), 0.0).astype(y.dtype)

    def poolScatter(a):
        out = poolOps._poolCore(a, (2, 2), (2, 2), (0, 0), "max")
        _, vjp = jax.vjp(lambda aa: poolOps._poolCore(aa, (2, 2), (2, 2), (0, 0), "max"), a)
        da = vjp(out)[0]          # out stands in for the downstream grad
        return out, da

    def poolTiled(a):
        out = poolOps.poolNd(a, (2, 2), (2, 2), (0, 0), "max")
        da = poolOps.poolNdBackward(out, a, (2, 2), (2, 2), (0, 0), "max")
        return out, da

    def consume(*ts):
        return sum(jnp.max(t.astype(jnp.float32)) for t in ts).reshape(1)

    def block(xi, *, bwdData=False, bwdFilter=False, pool=None):
        y = convF(xi)
        a = relu(y)

        if pool is not None:
            pooled, da = (poolScatter if pool == "scatter" else poolTiled)(a)
            outs = [pooled]
        else:
            da, outs = a, []

        if not (bwdData or bwdFilter):
            return consume(a, *outs)

        dy = (da * (y > 0).astype(da.dtype))

        if bwdData:
            dx = convOps.convNdBackwardData(dy, wts, xi.shape, stride, pad, dil, 1)
            outs.append(dx)

        if bwdFilter:
            dw, db = convOps.convNdBackwardParams(xi, dy, wts, stride, pad, dil, 1, hasBias=True)
            outs.extend([dw, db])

        return consume(a, *outs)

    results = {}

    def t(label, **kw):
        def step(i, xx, d):
            return block(xx.at[:, :rows].add(d[i]), **kw)

        secs = marginalTime(step, (x, deltas), reps1=r1, reps2=r2, k=3)
        results[label] = secs
        print("%-26s %9.1f us" % (label, secs * 1e6), flush=True)

    t("fwd")
    t("fwd+bwdData", bwdData=True)
    t("fwd+bwdD+bwdF", bwdData=True, bwdFilter=True)
    t("full+pool(scatter)", bwdData=True, bwdFilter=True, pool="scatter")
    t("full+pool(tiled)", bwdData=True, bwdFilter=True, pool="tiled")

    flops = 2.0 * n * h * w * c * co * 9
    print()
    print("conv fwd ideal %.1f us; marginals: bwdData %+9.1f us, bwdFilter %+9.1f us, "
          "pool fwd+bwd scatter %+9.1f us / tiled %+9.1f us" % (
              flops / 197e12 * 1e6,
              (results["fwd+bwdData"] - results["fwd"]) * 1e6,
              (results["fwd+bwdD+bwdF"] - results["fwd+bwdData"]) * 1e6,
              (results["full+pool(scatter)"] - results["fwd+bwdD+bwdF"]) * 1e6,
              (results["full+pool(tiled)"] - results["fwd+bwdD+bwdF"]) * 1e6))


if __name__ == "__main__":
    main()
