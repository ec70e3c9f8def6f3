"""Measure candidate 3x3-conv formulations on the chip (design probe).

Small-kernel convs are the perf frontier: the ResNet/VGG body shapes run at
14-56 TF/s on both the XLA path and the batch-in-lanes Pallas kernel (which
wastes 96/128 lanes at batch 32).  This probe times the plausible
formulations chained inside one jitted program (relay-honest methodology, see
docs/kernels.md) to decide what the dedicated small-kernel schedule should be.

Run: JAX_PLATFORMS=axon python tools/conv3x3_probe.py [--quick]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache
from puzzlelib_tpu.ops import conv as opsconv


def fence(x):
    return np.asarray(x.ravel()[:1])


def bench(fn, x, w, flops, reps, iters=2, label=""):
    @jax.jit
    def chained(x, w):
        acc = jnp.zeros((8, ), jnp.float32)
        for i in range(reps):
            out = fn(x, w + jnp.bfloat16(i))
            acc += out.ravel()[:8].astype(jnp.float32)
        return acc

    try:
        t0 = time.time()
        fence(chained(x, w))
        compileSecs = time.time() - t0

        start = time.perf_counter()
        for _ in range(iters):
            out = chained(x, w)
        fence(out)
        secs = (time.perf_counter() - start) / iters / reps
    except Exception as exc:
        print("  %-24s FAILED: %s" % (label, str(exc)[:120]))
        return None

    print("  %-24s %9.3f us  %7.2f TF/s (%4.1f%% peak)  [compile %.0fs]"
          % (label, secs * 1e6, flops / secs / 1e12, flops / secs / 197e12 * 100, compileSecs))
    return secs


NHWC = ("NHWC", "HWIO", "NHWC")


def xlaNhwc(x, w):          # x (N,H,W,C), w (KH,KW,C,CO)
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=NHWC,
        preferred_element_type=jnp.float32).astype(x.dtype)


def shiftSum(x, w):
    """Tap decomposition: 9 shifted GEMMs, out[n,y,x,:] += xpad[n,y+dy,x+dx,:] @ w[dy,dx]."""
    n, h, wd, c = x.shape
    kh, kw, _, co = w.shape

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((n, h, wd, co), jnp.float32)

    for dy in range(kh):
        for dx in range(kw):
            out = out + jnp.einsum(
                "nhwc,co->nhwo", xp[:, dy:dy + h, dx:dx + wd, :], w[dy, dx],
                preferred_element_type=jnp.float32)

    return out.astype(x.dtype)


def im2colGemm(x, w):
    """Materialized patches + one big GEMM (M=N*OH*OW, K=9C, N=CO)."""
    n, h, wd, c = x.shape
    kh, kw, _, co = w.shape

    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), [(1, 1), (1, 1)], dimension_numbers=NHWC)
    m = n * h * wd
    out = patches.reshape(m, c * kh * kw) @ w.transpose(2, 0, 1, 3).reshape(c * kh * kw, co)
    return out.astype(x.dtype)


def main():
    quick = "--quick" in sys.argv
    enableCompileCache()

    shapes = [
        (32, 256, 56, 56, 256),
        (32, 512, 28, 28, 512),
    ]
    if not quick:
        shapes += [
            (128, 256, 56, 56, 256),
            (32, 64, 56, 56, 64),
            (16, 128, 112, 112, 128),   # VGG-ish stage
        ]

    for n, c, h, wd, co in shapes:
        flops = 2.0 * n * co * h * wd * c * 9
        reps = max(4, min(24, int(2e12 / flops)))

        print("shape n%d c%d %dx%d co%d (%.1f GFLOP/conv, reps=%d)"
              % (n, c, h, wd, co, flops / 1e9, reps))

        kx, kw_ = jax.random.split(jax.random.key(0))
        xn = (jax.random.normal(kx, (n, c, h, wd), jnp.float32) * 0.1).astype(jnp.bfloat16)
        wn = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        xl = xn.transpose(0, 2, 3, 1) + jnp.bfloat16(0)
        wl = wn.transpose(2, 3, 1, 0) + jnp.bfloat16(0)
        fence(xl)

        bench(lambda a, b: opsconv._convCore(a, b, (1, 1), (1, 1), (1, 1), 1),
              xn, wn, flops, reps, label="production (NCHW api)")
        bench(xlaNhwc, xl, wl, flops, reps, label="xla pure NHWC")
        bench(shiftSum, xl, wl, flops, reps, label="9-shift einsum")
        bench(im2colGemm, xl, wl, flops, reps, label="im2col + gemm")


if __name__ == "__main__":
    main()
