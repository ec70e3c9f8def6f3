"""Probe: pitch-row tap-dot direct conv for small kernels (design probe).

Layout: NHWC with the (i, j) spatial pair flattened to rows of PITCH WP =
OW + KW - 1 (the kw halo lives inside the row).  Then filter tap (r, s) is a
pure SUBLANE offset r*WP + s into the input block, and the conv is kh*kw MXU
dots per output block:

    acc[bi*WP, CO] += xbuf[r*WP + s : r*WP + s + bi*WP, :C] @ w[r, s]

M = bi*WP (hundreds), K = C, N = CO - full MXU shapes at C, CO >= 128 with
ZERO transform-domain inflation and no VPU butterflies; the only question is
what Mosaic charges for the sublane-misaligned reads.  Output keeps the same
pitch layout (garbage columns j >= OW cropped by the exit slice, which
cancels between chained convs).

Run: python tools/tapdot_probe.py [--interpret]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def _kernel(xRef, wRef, outRef, xBuf, acc, sems, *,
            bi, wp, kh, kw, c, co, fetchRows, nTiles, outDtype):
    n, t = pl.program_id(0), pl.program_id(1)

    step = n * nTiles + t
    total = pl.num_programs(0) * nTiles

    def fetch(slot, nI, tI):
        return pltpu.make_async_copy(
            xRef.at[nI, pl.ds(tI * bi * wp, fetchRows), :],
            xBuf.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        fetch(slot, n, t).start()

    nxt = step + 1
    tN = jax.lax.rem(nxt, nTiles)
    nN = nxt // nTiles

    @pl.when(nxt < total)
    def _():
        fetch(1 - slot, nN, tN).start()

    fetch(slot, n, t).wait()

    mb = bi * wp

    first = True
    for r in range(kh):
        for s in range(kw):
            patch = xBuf[slot, pl.ds(r * wp + s, mb), :]
            part = jnp.dot(patch, wRef[r * kw + s],
                           preferred_element_type=jnp.float32)
            if first:
                acc[...] = part
                first = False
            else:
                acc[...] += part

    outRef[0] = acc[...].astype(outDtype)


@functools.partial(jax.jit, static_argnames=("bi", "wp", "kh", "kw", "c", "co",
                                             "nTiles", "interpret"))
def tapdot(xp, wk, *, bi, wp, kh, kw, c, co, nTiles, interpret=False):
    """xp (N, rows, C) pitch-layout input (rows >= nTiles*bi*wp + halo,
    8-aligned); wk (kh*kw, C, CO).  Returns (N, nTiles*bi*wp, CO)."""
    n = xp.shape[0]
    fetchRows = -(-((bi + kh - 1) * wp + kw - 1) // 8) * 8

    return pl.pallas_call(
        functools.partial(
            _kernel, bi=bi, wp=wp, kh=kh, kw=kw, c=c, co=co,
            fetchRows=fetchRows, nTiles=nTiles, outDtype=xp.dtype,
        ),
        grid=(n, nTiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bi * wp, co), lambda nI, tI: (nI, tI, 0)),
        out_shape=jax.ShapeDtypeStruct((n, nTiles * bi * wp, co), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, fetchRows, c), xp.dtype),
            pltpu.VMEM((bi * wp, co), jnp.float32),
            pltpu.SemaphoreType.DMA((2, )),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * nTiles * bi * wp * c * co * kh * kw,
            bytes_accessed=int(n * nTiles * fetchRows * c * xp.dtype.itemsize
                               + wk.size * wk.dtype.itemsize
                               + n * nTiles * bi * wp * co * xp.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wk)


def conv2d(x, w, pad=(1, 1), bi=None, interpret=False):
    """NCHW 3x3/5x5 stride-1 conv through the tap-dot kernel (probe entry)."""
    n, c, h, wd = x.shape
    co, _, kh, kw = w.shape

    oh = h + 2 * pad[0] - kh + 1
    ow = wd + 2 * pad[1] - kw + 1
    wp = ow + kw - 1

    if bi is None:
        bi = 8
        while (bi * wp) % 8 != 0:
            bi += 1
        while bi < oh and bi * wp < 400:
            bi2 = bi + 1
            while (bi2 * wp) % 8 != 0:
                bi2 += 1
            if bi2 > oh:
                break
            bi = bi2

    nTiles = -(-oh // bi)

    # NCHW -> pitch rows: xp[n, i*wp + j, :] = xpad[n, i, j, :]
    xl = jnp.pad(x.transpose(0, 2, 3, 1),
                 ((0, 0), (pad[0], pad[0]), (pad[1], wp - wd - pad[1]), (0, 0)))
    hp = xl.shape[1]
    xp = xl.reshape(n, hp * wp, c)

    fetchRows = -(-((bi + kh - 1) * wp + kw - 1) // 8) * 8
    rowsNeeded = (nTiles - 1) * bi * wp + fetchRows
    if xp.shape[1] < rowsNeeded:
        xp = jnp.pad(xp, ((0, 0), (0, rowsNeeded - xp.shape[1]), (0, 0)))

    wk = w.transpose(2, 3, 1, 0).reshape(kh * kw, c, co)

    out = tapdot(xp, wk, bi=bi, wp=wp, kh=kh, kw=kw, c=c, co=co,
                 nTiles=nTiles, interpret=interpret)

    out = out.reshape(n, nTiles * bi, wp, co)[:, :oh, :ow, :]
    return out.transpose(0, 3, 1, 2)


def fence(x):
    return np.asarray(x.ravel()[:1])


def timeChain(fn, args, reps, iters=2):
    @jax.jit
    def chained(*args):
        acc = jnp.zeros((), jnp.float32)
        for i in range(reps):
            out = fn(i, *args)
            acc += jnp.max(out).astype(jnp.float32)
        return acc

    t0 = time.time()
    fence(chained(*args))
    comp = time.time() - t0

    start = time.perf_counter()
    for _ in range(2):
        out = chained(*args)
    fence(out)
    return (time.perf_counter() - start) / 2 / reps, comp


def main():
    interpret = "--interpret" in sys.argv

    if interpret:
        np.random.seed(5)
        for (n, c, h, w, co, kh, p) in [(2, 128, 12, 10, 128, 3, 1),
                                        (1, 128, 9, 9, 128, 5, 2)]:
            x = jnp.asarray(np.random.randn(n, c, h, w), jnp.float32)
            wt = jnp.asarray(np.random.randn(co, c, kh, kh) * 0.1, jnp.float32)
            out = conv2d(x, wt, (p, p), interpret=True)

            oh, ow = h + 2 * p - kh + 1, w + 2 * p - kh + 1
            xn = np.pad(np.asarray(x, np.float64), ((0, 0), (0, 0), (p, p), (p, p)))
            wn = np.asarray(wt, np.float64)
            ref = np.zeros((n, co, oh, ow))
            for i in range(kh):
                for j in range(kh):
                    ref += np.einsum("nchw,oc->nohw",
                                     xn[:, :, i:i + oh, j:j + ow], wn[:, :, i, j])

            err = np.abs(np.asarray(out) - ref).max()
            print("shape %s k%d: err %.2e" % ((n, c, h, w, co), kh, err))
            assert err < 1e-3 * max(1.0, np.abs(ref).max())
        return

    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    shapes = [
        ("r50-56", (32, 256, 56, 56), 256, 1),
        ("r50-28", (32, 512, 28, 28), 512, 1),
        ("vgg-112", (16, 128, 112, 112), 128, 1),
    ]

    for name, xs_, co, pad in shapes:
        n, c, h, wd = xs_
        oh, ow = h + 2 * pad - 2, wd + 2 * pad - 2
        flops = 2.0 * n * co * oh * ow * c * 9
        reps = max(4, min(12, int(1.5e12 / flops)))

        kx, kw_ = jax.random.split(jax.random.key(0))
        x = (jax.random.normal(kx, xs_, jnp.float32) * 0.3).astype(jnp.bfloat16)
        w = (jax.random.normal(kw_, (co, c, 3, 3), jnp.float32) * 0.1).astype(jnp.bfloat16)
        fence(x)

        from jax import lax
        ref = lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
            [(pad, pad), (pad, pad)], dimension_numbers=("NCHW", "OIHW", "NCHW"))
        try:
            got = conv2d(x, w, (pad, pad))
        except Exception as exc:
            print("%-8s FAILED: %s" % (name, str(exc)[:200]))
            continue

        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        scale = float(jnp.abs(ref).max())
        print("%-8s rel err %.2e" % (name, err / scale))

        if err / scale > 5e-2:
            print("  MISMATCH - skipping timing")
            continue

        sec, comp = timeChain(
            lambda i, x, w: conv2d(x, w + jnp.bfloat16(i * 2 ** -8), (pad, pad)),
            (x, w), reps)
        print("  full     %9.1f us  %7.2f TF/s (%4.1f%% peak)  [compile %.0fs]"
              % (sec * 1e6, flops / sec / 1e12, flops / sec / 197e12 * 100, comp))


if __name__ == "__main__":
    main()
