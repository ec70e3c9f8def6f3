"""Tiled MXU matmul kernel with K-accumulation and simple autotuning.

Grid is (M/bm, N/bn, K/bk) with the K axis innermost ("arbitrary" semantics):
each (i, j) tile revisits its output block accumulating partial products in a
float32 VMEM scratch accumulator, writing back once on the last K step - the
canonical Pallas TPU matmul schedule.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmulKernel(aRef, bRef, outRef, accRef, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        accRef[...] = jnp.zeros_like(accRef)

    # Pin the dot precision explicitly per dtype (the global
    # jax_default_matmul_precision=highest asks Mosaic for a multi-pass bf16
    # dot it cannot lower):
    #   f32 inputs  -> HIGHEST: full f32 mantissa via MXU passes, numerics
    #                  match the XLA dot under the framework's default
    #   bf16/f16    -> DEFAULT: single MXU pass, exact for bf16 operands,
    #                  f32 accumulation in the VMEM scratch
    #   int8        -> DEFAULT: native MXU int8 passes (2x bf16 rate on v5e),
    #                  exact int32 accumulation in the VMEM scratch
    prec = jax.lax.Precision.HIGHEST if aRef.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    accRef[...] += jnp.dot(aRef[...], bRef[...],
                           preferred_element_type=accRef.dtype, precision=prec)

    @pl.when(k == nk - 1)
    def _():
        outRef[...] = accRef[...].astype(outRef.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def matmul(a, b, bm=512, bn=512, bk=512, interpret=False):
    """a (M, K) @ b (K, N) -> (M, N); M, N, K should be multiples of the tiles
    (the dispatch layer pads otherwise).

    int8 operands accumulate exactly in an int32 VMEM scratch and return int32
    (the serving-path quantized GEMM; reference analog: the TensorRT int8
    engines, Converter/TensorRT/BuildRTEngine.py:181-193)."""
    m, k = a.shape
    _, n = b.shape

    isInt = jnp.issubdtype(a.dtype, jnp.integer)
    accDt = jnp.int32 if isInt else jnp.float32
    outDt = jnp.int32 if isInt else a.dtype

    bm, bn, bk = min(bm, m), min(bn, n), min(bk, k)
    nk = pl.cdiv(k, bk)

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), nk)

    return pl.pallas_call(
        functools.partial(_matmulKernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), outDt),
        scratch_shapes=[pltpu.VMEM((bm, bn), accDt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n + m * n) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)


def matmulPadded(a, b, bm=512, bn=512, bk=512, interpret=False):
    """Pad to tile multiples, run the kernel, slice back."""
    m, k = a.shape
    _, n = b.shape

    # sublane granularity scales with packing: 8 rows f32, 16 bf16, 32 int8
    sub = {1: 32, 2: 16, 4: 8}.get(np.dtype(a.dtype).itemsize, 8)
    mp = -(-m // sub) * sub if m < bm else -(-m // bm) * bm
    npad = -(-n // 128) * 128 if n < bn else -(-n // bn) * bn
    kp = -(-k // 128) * 128 if k < bk else -(-k // bk) * bk

    if (mp, npad, kp) != (m, n, k):
        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
        b = jnp.pad(b, ((0, kp - k), (0, npad - n)))

    out = matmul(a, b, bm=bm, bn=bn, bk=bk, interpret=interpret)

    if (mp, npad) != (m, n):
        out = out[:m, :n]

    return out


_TILE_CANDIDATES = [
    (256, 256, 256), (512, 512, 512), (512, 512, 1024), (1024, 512, 512),
    (512, 1024, 512), (256, 512, 512), (512, 256, 512), (1024, 1024, 512),
    # wide-K / bf16-friendly shapes: fewer revisits of the accumulator, more
    # MXU work per VMEM byte (v5e VMEM budget allows up to ~1024^2 f32 acc)
    (512, 1024, 1024), (1024, 1024, 1024), (256, 1024, 1024), (512, 512, 2048),
    (1024, 256, 1024), (256, 256, 2048),
]

_tuned = {}


def autotune(m, n, k, dtype=np.float32, iters=10):
    """Time tile candidates for (m, n, k); cache per shape signature."""
    import time

    key = (m, n, k, np.dtype(dtype).str)
    if key in _tuned:
        return _tuned[key]

    a = jnp.zeros((m, k), dtype)
    b = jnp.zeros((k, n), dtype)

    best, bestTiles = float("inf"), _TILE_CANDIDATES[0]

    for bm, bn, bk in _TILE_CANDIDATES:
        if bm > m or bn > n or bk > k:
            continue

        try:
            fn = lambda: matmul(a, b, bm=bm, bn=bn, bk=bk)
            # tiny readback fence: block_until_ready is a no-op on relayed
            # PJRT backends, timing with it measures async dispatch only
            np.asarray(fn().ravel()[:1])

            start = time.perf_counter()
            for _ in range(iters):
                out = fn()
            np.asarray(out.ravel()[:1])
            secs = (time.perf_counter() - start) / iters

        except Exception:
            continue

        if secs < best:
            best, bestTiles = secs, (bm, bn, bk)

    _tuned[key] = bestTiles
    _tunedSecs[key] = best
    return bestTiles


_tunedSecs = {}

# per-shape measured dispatch for `Config.gemmAlgo="auto"`:
#   key -> (bm, bn, bk) tiles when the Pallas kernel measured faster than the
#   XLA dot, or None when XLA won.  Filled by `tuneDispatch` (reached through
#   `Linear.optimizeForShape` and `gemmspeed --tune`); consulted by
#   `backend.blas` before its static shape heuristic.
_dispatch = {}


def dispatchKey(m, n, k, dtype):
    return (m, n, k, np.dtype(dtype).str)


def tuneDispatch(m, n, k, dtype=np.float32, iters=10):
    """Measure the XLA dot against the best Pallas tiling for (m, n, k) and
    memoize which one eager GEMMs of this shape should use.

    The equivalent of cuDNN's per-shape algo search for the GEMM path
    (reference: Cuda/GPUBackend.py:371 pattern applied to Linear)."""
    import time

    key = dispatchKey(m, n, k, dtype)
    if key in _dispatch:
        return _dispatch[key]

    tiles = autotune(m, n, k, dtype=dtype, iters=iters)
    pallasSecs = _tunedSecs.get((m, n, k, np.dtype(dtype).str), float("inf"))

    a = jnp.zeros((m, k), dtype)
    b = jnp.zeros((k, n), dtype)

    xla = jax.jit(lambda x, y: x @ y)
    np.asarray(xla(a, b).ravel()[:1])

    start = time.perf_counter()
    for _ in range(iters):
        out = xla(a, b)
    np.asarray(out.ravel()[:1])
    xlaSecs = (time.perf_counter() - start) / iters

    _dispatch[key] = tiles if pallasSecs < xlaSecs else None
    return _dispatch[key]
