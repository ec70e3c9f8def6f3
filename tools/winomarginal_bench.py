"""Honest (rep-marginal) timing for winograd vs XLA NHWC conv.

The axon relay charges a ~10-19 ms fixed cost PER CHAINED CALL that the
naive time/reps quotient smears over the reps, inflating per-op numbers by
up to ~1.6 ms.  Differencing two chain lengths cancels it:

    t_op = (T(reps2) - T(reps1)) / (reps2 - reps1)

Operand perturbation rides on the small filter (not the activations) so the
perturb op adds ~nothing to the marginal.

Run: python tools/winomarginal_bench.py
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


def marginal(fn, args, reps1=4, reps2=12, iters=3):
    """fn(i, *args) -> array; returns marginal secs/op."""
    def make(reps):
        @jax.jit
        def chained(*args):
            acc = jnp.zeros((), jnp.float32)
            for i in range(reps):
                acc += jnp.max(fn(i, *args).astype(jnp.float32))
            return acc
        return chained

    f1, f2 = make(reps1), make(reps2)

    t0 = time.time()
    fence(f1(*args)); fence(f2(*args))
    comp = time.time() - t0

    t = time.perf_counter()
    for _ in range(iters):
        o = f1(*args)
    fence(o)
    t1 = (time.perf_counter() - t) / iters

    t = time.perf_counter()
    for _ in range(iters):
        o = f2(*args)
    fence(o)
    t2 = (time.perf_counter() - t) / iters

    return (t2 - t1) / (reps2 - reps1), comp


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
        flops = 2.0 * n * co * oh * ow * c * 9

        kx, kw_ = jax.random.split(jax.random.key(0))
        xn = (jax.random.normal(kx, (n, h, wd, c), jnp.float32) * 0.3).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(xn)

        ref = lax.conv_general_dilated(
            xn.astype(jnp.float32), w.astype(jnp.float32).transpose(2, 3, 1, 0),
            (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        scale = float(jnp.abs(ref).max())

        for scheme in ("mcat", "rmw"):
            try:
                got = winograd.conv2dNHWC(xn, w, (pad, pad), scheme=scheme)
            except ValueError as exc:
                print("%-8s %-5s infeasible: %s" % (name, scheme, str(exc)[:80]))
                continue

            err = float(jnp.abs(got.astype(jnp.float32) - ref).max()) / scale

            deltasW = (jax.random.normal(jax.random.key(7), (16,) + w.shape,
                                         jnp.float32) * 0.01).astype(jnp.bfloat16)

            def wino(i, x, w, deltas, scheme=scheme):
                return winograd.conv2dNHWC(
                    x, w + deltas[i], (pad, pad), scheme=scheme)

            sec, comp = marginal(wino, (xn, w, deltasW))
            print("%-8s wino-%-5s %8.1f us  %7.2f TF/s-direct (%5.1f%% peak)  "
                  "rel err %.1e  [compile %.0fs]"
                  % (name, scheme, sec * 1e6, flops / sec / 1e12,
                     flops / sec / 197e12 * 100, err, comp))

        # scalar perturbations are CSE-bait: conv is linear in w, so XLA
        # rewrites conv(x, w + c) = conv(x, w) + c*boxsum(x) and hoists the
        # real conv out of the chain - an ARRAY delta defeats that
        deltas = (jax.random.normal(jax.random.key(7), (16,) + w.shape,
                                    jnp.float32) * 0.01).astype(jnp.bfloat16)

        def direct(i, x, w, deltas):
            out = lax.conv_general_dilated(
                x, (w + deltas[i]).transpose(2, 3, 1, 0),
                (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return out.astype(x.dtype)

        sec, comp = marginal(direct, (xn, w, deltas))
        print("%-8s xla-nhwc   %8.1f us  %7.2f TF/s (%5.1f%% peak)  [compile %.0fs]"
              % (name, sec * 1e6, flops / sec / 1e12,
                 flops / sec / 197e12 * 100, comp))


if __name__ == "__main__":
    main()
