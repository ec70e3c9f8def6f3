"""Benchmark + verify the conv3 (channels-in-sublanes) kernel on the chip.

Run: python tools/conv3_bench.py [nrows...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache
from puzzlelib_tpu.ops.pallas import conv3


def fence(x):
    return np.asarray(x.ravel()[:1])


def main():
    enableCompileCache()

    shapes = [
        (32, 256, 56, 56, 256, 1),
        (32, 512, 28, 28, 512, 1),
        (32, 64, 56, 56, 64, 1),
        (32, 128, 28, 28, 512, 1),    # ResNet projection-ish
        (16, 128, 112, 112, 128, 1),  # VGG stage
    ]

    for n, c, h, wd, co, p in shapes:
        oh, ow = h + 2 * p - 2, wd + 2 * p - 2
        flops = 2.0 * n * co * oh * ow * c * 9
        reps = max(4, min(24, int(2e12 / flops)))

        kx, kw_ = jax.random.split(jax.random.key(0))
        x = (jax.random.normal(kx, (n, c, h, wd), jnp.float32) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(x)

        # correctness vs the XLA conv on-chip (bf16 both)
        ref = lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        got = conv3.conv2d(x, w, (p, p))
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        scale = float(jnp.abs(ref).max())
        print("shape n%d c%d %dx%d co%d: rel err %.2e" % (n, c, h, wd, co, err / scale))

        if err / scale > 2e-2:
            print("  NUMERIC MISMATCH - skipping timing")
            continue

        feasible = [int(a) for a in sys.argv[1:]] or [None]

        for nrows in feasible:
            @jax.jit
            def chained(x, w, nrows=nrows):
                acc = jnp.zeros((8, ), jnp.float32)
                for i in range(reps):
                    out = conv3.conv2d(x, w + jnp.bfloat16(i), (p, p), nrows=nrows)
                    acc += out.ravel()[:8].astype(jnp.float32)
                return acc

            try:
                t0 = time.time()
                fence(chained(x, w))
                compileSecs = time.time() - t0

                start = time.perf_counter()
                for _ in range(2):
                    out = chained(x, w)
                fence(out)
                secs = (time.perf_counter() - start) / 2 / reps
            except Exception as exc:
                print("  nrows=%s FAILED: %s" % (nrows, str(exc)[:100]))
                continue

            print("  nrows=%-4s %9.3f us  %7.2f TF/s (%4.1f%% peak)  [compile %.0fs]"
                  % (nrows, secs * 1e6, flops / secs / 1e12,
                     flops / secs / 197e12 * 100, compileSecs))


if __name__ == "__main__":
    main()
