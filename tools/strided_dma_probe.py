"""Probe: can Mosaic DMA a stride-2 phase slab from a reshaped NHWC view?

If xpad (N, HP, WP, C) is viewed (free reshape) as (N, HP/2, 2, WP/2, 2, C),
then phase (ap, bp) of a Winograd entry pass is the slice
``x6[n, i0:i0+rows, ap, :, bp, :]`` - a strided HBM access pattern.  If
make_async_copy accepts it at tolerable bandwidth, the Winograd kernel can
consume NHWC directly and the 1.7 ms XLA entry pass disappears.

Run: python tools/strided_dma_probe.py
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


def _kernel(xRef, outRef, buf, sems, *, rows, tw, c, nTiles):
    t = pl.program_id(0)

    def fetch(slot, tI):
        return [
            pltpu.make_async_copy(
                xRef.at[0, pl.ds(tI * rows, rows), ap, :, bp, :],
                buf.at[slot, ap * 2 + bp],
                sems.at[slot, ap * 2 + bp],
            )
            for ap in range(2) for bp in range(2)
        ]

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for cp in fetch(slot, t):
            cp.start()

    @pl.when(t + 1 < nTiles)
    def _():
        for cp in fetch(1 - slot, t + 1):
            cp.start()

    for cp in fetch(slot, t):
        cp.wait()

    outRef[0] = buf[slot]


@functools.partial(jax.jit, static_argnames=("rows", "tw", "c", "nTiles"))
def phaseSplit(x6, *, rows, tw, c, nTiles):
    return pl.pallas_call(
        functools.partial(_kernel, rows=rows, tw=tw, c=c, nTiles=nTiles),
        grid=(nTiles, ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 4, rows, tw, c), lambda t: (t, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nTiles, 4, rows, tw, c), x6.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4, rows, tw, c), x6.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", )),
    )(x6)


def fence(x):
    return np.asarray(x.ravel()[:1])


def main():
    n, h, wd, c = 1, 64, 64, 256
    th, tw = h // 2, wd // 2
    rows = 4                      # tile rows per step

    x = jnp.asarray(np.random.randn(n, h, wd, c), jnp.float32).astype(jnp.bfloat16)
    x6 = x.reshape(n, th, 2, tw, 2, c)

    nTiles = th // rows

    try:
        out = phaseSplit(x6, rows=rows, tw=tw, c=c, nTiles=nTiles)
        out.block_until_ready()
    except Exception as exc:
        print("FAILED:", str(exc)[:8000])
        return

    # correctness
    want = np.asarray(x6).transpose(2, 4, 0, 1, 3, 5)   # ap, bp, n, i, j, c
    got = np.asarray(out).reshape(nTiles, 4, rows, tw, c)
    ref = want.reshape(4, th, tw, c)
    for t in range(nTiles):
        for p in range(4):
            np.testing.assert_array_equal(got[t, p], ref[p, t * rows:(t + 1) * rows])
    print("strided phase DMA works; checking bandwidth")

    @jax.jit
    def chained(x6):
        acc = jnp.zeros((), jnp.float32)
        for i in range(8):
            out = phaseSplit(x6 + jnp.bfloat16(i * 2 ** -8),
                             rows=rows, tw=tw, c=c, nTiles=nTiles)
            acc += jnp.max(out).astype(jnp.float32)
        return acc

    fence(chained(x6))
    start = time.perf_counter()
    for _ in range(2):
        out = chained(x6)
    fence(out)
    sec = (time.perf_counter() - start) / 2 / 8

    bytes_ = 2 * x.size * x.dtype.itemsize      # read + write
    print("%.1f us -> %.1f GB/s effective" % (sec * 1e6, bytes_ / sec / 1e9))


if __name__ == "__main__":
    main()
