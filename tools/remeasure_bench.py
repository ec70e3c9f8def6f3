"""Honest re-measurement of the dispatch-driving kernel comparisons.

Method: min-of-5 fenced calls, rep-differencing (8 vs 40), array-delta
perturbations (see tools/convfinal_bench.py and docs/kernels.md).

Sections (pass section names as argv to select; default all):
  fg        - 3x3 bwd-filter: XLA batch-role-swap vs winograd transform dU
  convspeed - 11x11 ConvSpeed shape: Pallas HCWN vs XLA (fwd + bwd-data)
  gemm      - 8192x8192x8192 bf16 GEMM: XLA vs Pallas tiles

Run: python tools/remeasure_bench.py [fg] [convspeed] [gemm]
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


def minTime(f, args, k=5):
    best = float("inf")
    for _ in range(k):
        t = time.perf_counter()
        fence(f(*args))
        best = min(best, time.perf_counter() - t)
    return best


def marginal(fn, args, reps1=8, reps2=40):
    """Rep-differenced timing with lax.scan chains: O(1) program size (the
    remote compiler 413s on long unrolled chains), no cross-rep CSE."""
    def make(reps):
        @jax.jit
        def chained(*args):
            def body(acc, i):
                return acc + jnp.max(fn(i, *args).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(reps))
            return acc
        return chained

    f1, f2 = make(reps1), make(reps2)
    fence(f1(*args)); fence(f2(*args))

    t1, t2 = minTime(f1, args), minTime(f2, args)
    return (t2 - t1) / (reps2 - reps1)


def reportFG():
    from puzzlelib_tpu.ops import conv as opsconv
    from puzzlelib_tpu.ops.pallas import winograd

    shapes = [
        ("r50-56", (32, 256, 56, 56), 256, 1),
        ("r50-28", (32, 512, 28, 28), 512, 1),
        ("vgg-112", (16, 128, 112, 112), 128, 1),
    ]

    for name, xsh, co, pad in shapes:
        n, c, h, wd = xsh
        oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
        flops = 2.0 * n * co * oh * ow * c * 9

        kx, kg = jax.random.split(jax.random.key(1))
        xn = (jax.random.normal(kx, (n, h, wd, c), jnp.float32) * 0.3).astype(jnp.bfloat16)
        dyn = (jax.random.normal(kg, (n, oh, ow, co), jnp.float32) * 0.1).astype(jnp.bfloat16)
        deltas = (jax.random.normal(jax.random.key(8), (48, n, 8, ow, co),
                                    jnp.float32) * 0.01).astype(jnp.bfloat16)
        fence(xn); fence(deltas)

        # correctness cross-check on chip
        ref = opsconv._filterGradDense(
            xn.transpose(0, 3, 1, 2).astype(jnp.float32),
            dyn.transpose(0, 3, 1, 2).astype(jnp.float32),
            (3, 3), (1, 1), (pad, pad), (1, 1))
        got = winograd.filterGradNHWC(xn, dyn, (pad, pad))
        err = float(jnp.abs(got - ref).max()) / float(jnp.abs(ref).max())

        def winoFG(i, x, dy, deltas):
            # perturb via the traced parameter (NOT the enclosing concrete
            # array: a closure capture would embed all 48 deltas as a
            # constant in the compile payload -> relay HTTP 413)
            return winograd.filterGradNHWC(x, dy.at[:, :8].add(deltas[i]),
                                           (pad, pad))

        sec = marginal(winoFG, (xn, dyn, deltas), reps1=6, reps2=22)
        print("%-8s winoFG  %8.1f us  %7.2f TF/s-direct (%5.1f%% peak)  rel err %.1e"
              % (name, sec * 1e6, flops / sec / 1e12,
                 flops / sec / 197e12 * 100, err), flush=True)

        xb = xn.transpose(0, 3, 1, 2)
        dyb = dyn.transpose(0, 3, 1, 2)
        deltasB = deltas.transpose(0, 1, 4, 2, 3)

        def xlaFG(i, x, dy, deltasB):
            dyp = dy.at[:, :, :8].add(deltasB[i])
            return opsconv._filterGradDenseNhwc(
                x, dyp, (3, 3), (1, 1), (pad, pad), (1, 1))

        sec = marginal(xlaFG, (xb, dyb, deltasB), reps1=6, reps2=22)
        print("%-8s xlaFG   %8.1f us  %7.2f TF/s (%5.1f%% peak)"
              % (name, sec * 1e6, flops / sec / 1e12,
                 flops / sec / 197e12 * 100), flush=True)


def reportConvSpeed():
    from puzzlelib_tpu.ops import conv as opsconv
    from puzzlelib_tpu.ops.pallas import conv as pconv

    n, c, h, wd = 128, 32, 64, 64
    co, kh, kw = 64, 11, 11
    oh = ow = h - kh + 1
    flops = 2.0 * n * co * oh * ow * c * kh * kw

    kx, kw_ = jax.random.split(jax.random.key(0))
    x = (jax.random.normal(kx, (n, c, h, wd), jnp.float32) * 0.3).astype(jnp.bfloat16)
    w = (jax.random.normal(kw_, (co, c, kh, kw), jnp.float32) * 0.1).astype(jnp.bfloat16)
    deltas = (jax.random.normal(jax.random.key(9), (48, co, c, kh, kw),
                                jnp.float32) * 0.01).astype(jnp.bfloat16)
    fence(x); fence(deltas)

    def pallasFwd(i, x, w, deltas):
        return pconv.conv2d(x, w + deltas[i], (0, 0))

    sec = marginal(pallasFwd, (x, w, deltas))
    print("convspeed fwd  pallas %8.1f us  %7.2f TF/s (%5.1f%%)"
          % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)

    def xlaFwd(i, x, w, deltas):
        out = lax.conv_general_dilated(
            x.transpose(0, 2, 3, 1), (w + deltas[i]).transpose(2, 3, 1, 0),
            (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    sec = marginal(xlaFwd, (x, w, deltas))
    print("convspeed fwd  xla    %8.1f us  %7.2f TF/s (%5.1f%%)"
          % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)

    # bwd-data at the same geometry (dy 128x64x54x54 -> dx)
    dy = (jax.random.normal(kx, (n, co, oh, ow), jnp.float32) * 0.1).astype(jnp.bfloat16)
    fence(dy)

    def pallasBwd(i, dy, w, deltas):
        wr = jnp.flip(w + deltas[i], (2, 3)).swapaxes(0, 1)
        return pconv.conv2d(dy, wr, (kh - 1, kw - 1))

    try:
        sec = marginal(pallasBwd, (dy, w, deltas))
        print("convspeed bwdD pallas %8.1f us  %7.2f TF/s (%5.1f%%)"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)
    except Exception as exc:
        print("convspeed bwdD pallas FAILED %s" % str(exc)[:200], flush=True)

    def xlaBwd(i, dy, w, deltas):
        wr = jnp.flip(w + deltas[i], (2, 3)).swapaxes(0, 1)
        out = lax.conv_general_dilated(
            dy.transpose(0, 2, 3, 1), wr.transpose(2, 3, 1, 0),
            (1, 1), [(kh - 1, kh - 1), (kw - 1, kw - 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(dy.dtype)

    sec = marginal(xlaBwd, (dy, w, deltas))
    print("convspeed bwdD xla    %8.1f us  %7.2f TF/s (%5.1f%%)"
          % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)


def reportGemm():
    from puzzlelib_tpu.ops.pallas import matmul as pmm

    m = k = n = 8192
    flops = 2.0 * m * k * n

    a = (jax.random.normal(jax.random.key(0), (m, k), jnp.float32)).astype(jnp.bfloat16)
    b = (jax.random.normal(jax.random.key(1), (k, n), jnp.float32)).astype(jnp.bfloat16)
    deltas = (jax.random.normal(jax.random.key(2), (48, 8, n), jnp.float32)
              * 0.01).astype(jnp.bfloat16)
    fence(a); fence(deltas)

    def xg(i, a, b, deltas):
        bp = b.at[:8].add(deltas[i])
        return jnp.dot(a, bp, preferred_element_type=jnp.float32).astype(a.dtype)

    sec = marginal(xg, (a, b, deltas), reps1=4, reps2=16)
    print("gemm 8k^3 xla    %8.1f us  %7.2f TF/s (%5.1f%%)"
          % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)

    def pg(i, a, b, deltas):
        bp = b.at[:8].add(deltas[i])
        return pmm.matmul(a, bp, bm=1024, bn=1024, bk=512)

    try:
        sec = marginal(pg, (a, b, deltas), reps1=4, reps2=16)
        print("gemm 8k^3 pallas %8.1f us  %7.2f TF/s (%5.1f%%)"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)
    except Exception as exc:
        print("gemm pallas FAILED %s" % str(exc)[:200], flush=True)


def reportInt8():
    """Serving-path int8 GEMM kernel rate vs bf16 at the same geometry.

    The round-2 reading (257 TOP/s = 65% of the 394 TOP/s i8 peak) came
    from the chain-averaging harness; hypothesis (docs/kernels.md): the
    deficit is the fixed ~10-19 ms relay cost on a ~22 ms kernel, i.e. the
    kernel itself is near peak and no feed fix is needed.
    """
    m, k, n = 8192, 65536, 8192
    flops = 2.0 * m * k * n

    kA, kB = jax.random.split(jax.random.key(0))
    ai = jax.random.randint(kA, (m, k), -127, 127, jnp.int8)
    bi = jax.random.randint(kB, (k, n), -127, 127, jnp.int8)
    deltas = jax.random.randint(jax.random.key(3), (48, 8, n), -2, 2, jnp.int8)
    fence(ai); fence(deltas)

    def ig(i, a, b, deltas):
        bp = b.at[:8].add(deltas[i])
        return lax.dot_general(a, bp, (((1, ), (0, )), ((), ())),
                               preferred_element_type=jnp.int32)

    sec = marginal(ig, (ai, bi, deltas), reps1=2, reps2=8)
    print("int8 8kx64kx8k xla %8.1f us  %7.2f TOP/s (%5.1f%% of 394)"
          % (sec * 1e6, flops / sec / 1e12, flops / sec / 394e12 * 100), flush=True)

    from puzzlelib_tpu.ops.pallas import matmul as pmm

    for tiles in [(1024, 1024, 1024), (512, 1024, 2048), (1024, 1024, 2048)]:
        def pg(i, a, b, deltas, tiles=tiles):
            bp = b.at[:8].add(deltas[i])
            return pmm.matmul(a, bp, bm=tiles[0], bn=tiles[1], bk=tiles[2])

        try:
            sec = marginal(pg, (ai, bi, deltas), reps1=2, reps2=8)
            print("int8 8kx64kx8k pallas %s %8.1f us  %7.2f TOP/s (%5.1f%% of 394)"
                  % (tiles, sec * 1e6, flops / sec / 1e12,
                     flops / sec / 394e12 * 100), flush=True)
        except Exception as exc:
            print("int8 pallas %s FAILED %s" % (tiles, str(exc)[:160]), flush=True)

    ab = (jax.random.normal(kA, (m, k), jnp.float32) * 0.1).astype(jnp.bfloat16)
    bb = (jax.random.normal(kB, (k, n), jnp.float32) * 0.1).astype(jnp.bfloat16)
    deltasB = (jax.random.normal(jax.random.key(4), (48, 8, n), jnp.float32)
               * 0.01).astype(jnp.bfloat16)
    fence(ab); fence(deltasB)

    def bg(i, a, b, deltas):
        bp = b.at[:8].add(deltas[i])
        return jnp.dot(a, bp, preferred_element_type=jnp.float32).astype(a.dtype)

    sec = marginal(bg, (ab, bb, deltasB), reps1=2, reps2=8)
    print("bf16 8kx64kx8k xla %8.1f us  %7.2f TF/s (%5.1f%% of 197)"
          % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)


def reportFG11():
    """Honest bwd-filter at the reference ConvSpeed shape (11x11, co=64).

    docs/kernels.md "CO-wall" proves any MXU schedule is <=50% of peak
    here; this records the honest XLA number for PARITY."""
    from puzzlelib_tpu.ops import conv as opsconv

    n, c, h, wd = 128, 32, 64, 64
    co, kh, kw = 64, 11, 11
    oh = ow = h - kh + 1
    flops = 2.0 * n * co * oh * ow * c * kh * kw

    kx, kg = jax.random.split(jax.random.key(1))
    x = (jax.random.normal(kx, (n, c, h, wd), jnp.float32) * 0.3).astype(jnp.bfloat16)
    dy = (jax.random.normal(kg, (n, co, oh, ow), jnp.float32) * 0.1).astype(jnp.bfloat16)
    deltas = (jax.random.normal(jax.random.key(5), (48, n, co, 8, ow),
                                jnp.float32) * 0.01).astype(jnp.bfloat16)
    fence(x); fence(deltas)

    def fg(i, x, dy, deltas):
        dyp = dy.at[:, :, :8].add(deltas[i])
        return opsconv._filterGradDenseNhwc(x, dyp, (kh, kw), (1, 1), (0, 0), (1, 1))

    sec = marginal(fg, (x, dy, deltas), reps1=6, reps2=22)
    print("convspeed FG xla %8.1f us  %7.2f TF/s (%5.1f%%)"
          % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100), flush=True)


def main():
    enableCompileCache()

    sections = sys.argv[1:] or ["fg", "convspeed", "gemm"]

    for s in sections:
        {"fg": reportFG, "convspeed": reportConvSpeed, "gemm": reportGemm,
         "int8": reportInt8, "fg11": reportFG11}[s]()


if __name__ == "__main__":
    main()
