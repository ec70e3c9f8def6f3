"""Winograd F(2x2,3x3) conv probe, pure XLA (no Pallas).

out = A^T [ (G g G^T) . (B^T d B) ] A   per 4x4 input tile (stride 2),
summed over input channels: 16 batched GEMMs of (T x C) @ (C x CO) replace
the 9-tap direct conv — 2.25x fewer MXU FLOPs.  Transforms are +/- adds in
f32; GEMM operands are bf16 with f32 accumulation.

Rates are quoted in DIRECT-conv FLOPs (apples-to-apples with convspeed).

Run: python tools/winograd_probe.py
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


# B^T d B input transform / G g G^T filter transform / A^T m A output transform
BT = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0], [.5, .5, .5], [.5, -.5, .5], [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd(x, w, pad):
    """x (N, C, H, W) bf16, w (CO, C, 3, 3) bf16, stride 1 -> (N, CO, OH, OW)."""
    n, c, h, wd = x.shape
    co = w.shape[0]
    oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
    th, tw = -(-oh // 2), -(-ow // 2)

    # NHWC with halo: tile i,j covers rows 2i..2i+3, cols 2j..2j+3
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 2 * th + 2 - (h + 2 * pad) + pad),
                     (pad, 2 * tw + 2 - (wd + 2 * pad) + pad)))
    xl = xp.transpose(0, 2, 3, 1)                          # (N, HP, WP, C)

    # d[a,b] phase slices: (16, N, TH, TW, C)
    d = jnp.stack([
        lax.slice(xl, (0, a, b, 0), (n, a + 2 * th - 1, b + 2 * tw - 1, c), (1, 2, 2, 1))
        for a in range(4) for b in range(4)
    ])

    # V = B^T d B over the (a, b) tap axes, f32 adds
    bt = jnp.asarray(BT)
    d = d.reshape(4, 4, n, th, tw, c).astype(jnp.float32)
    v = jnp.einsum("xa,abntwc,yb->xyntwc", bt, d, bt)
    v = v.reshape(16, n * th * tw, c).astype(jnp.bfloat16)

    # U = G g G^T: (16, C, CO)
    u = jnp.einsum("xr,ocrs,ys->xyco", jnp.asarray(G), w.astype(jnp.float32),
                   jnp.asarray(G))
    u = u.reshape(16, c, co).astype(jnp.bfloat16)

    # the 16 batched GEMMs
    m = jax.lax.dot_general(v, u, (((2, ), (1, )), ((0, ), (0, ))),
                            preferred_element_type=jnp.float32)   # (16, T, CO)

    # Y = A^T m A
    at = jnp.asarray(AT)
    m = m.reshape(4, 4, n, th, tw, co)
    y = jnp.einsum("xa,abntwc,yb->ntxwyc", at, m, at)       # (N, TH, 2, TW, 2, CO)

    out = y.reshape(n, 2 * th, 2 * tw, co)[:, :oh, :ow, :]
    return out.transpose(0, 3, 1, 2).astype(x.dtype)


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


def main():
    enableCompileCache()

    shapes = [
        ("r50-56", (32, 256, 56, 56), 256, 1),
        ("r50-28", (32, 512, 28, 28), 512, 1),
        ("vgg-112", (16, 128, 112, 112), 128, 1),
        ("r18-56", (32, 64, 56, 56), 64, 1),
    ]

    for name, xs, co, pad in shapes:
        n, c, h, wd = xs
        oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
        flops = 2.0 * n * co * oh * ow * c * 9
        reps = max(4, min(16, int(1.5e12 / flops)))

        kx, kw_ = jax.random.split(jax.random.key(0))
        x = (jax.random.normal(kx, xs, jnp.float32) * 0.3).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(x)

        ref = lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
            [(pad, pad), (pad, pad)], dimension_numbers=("NCHW", "OIHW", "NCHW"))
        got = jax.jit(winograd, static_argnums=2)(x, w, pad)
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        scale = float(jnp.abs(ref).max())
        print("%-8s rel err %.2e" % (name, err / scale))

        if err / scale > 5e-2:
            print("  MISMATCH - skipping timing")
            continue

        def wino(i, x, w):
            return winograd(x, w + jnp.bfloat16(i * 2 ** -8), pad)

        sec, comp = timeChain(wino, (x, w), reps)
        print("  winograd %9.1f us  %7.2f TF/s-direct (%4.1f%% peak)  [compile %.0fs]"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))

        def direct(i, x, w):
            out = lax.conv_general_dilated(
                x.transpose(0, 2, 3, 1), (w + jnp.bfloat16(i * 2 ** -8)).transpose(2, 3, 1, 0),
                (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return out.astype(x.dtype)

        sec, comp = timeChain(direct, (x, w), reps)
        print("  xla-nhwc %9.1f us  %7.2f TF/s (%4.1f%% peak)  [compile %.0fs]"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))


if __name__ == "__main__":
    main()
