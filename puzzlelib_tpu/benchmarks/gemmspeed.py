"""GEMM roofline benchmark: Pallas kernel vs XLA dot, f32/bf16/int8.

Prints TFLOP/s per shape and the fraction of the chip's peak (v5e:
~197 TFLOP/s bf16, ~49 TFLOP/s f32-equivalent via MXU passes, ~394 TOP/s
int8). The autotuner picks the best tile per shape; pass --tune to print the
full per-tile sweep.

Run:  python -m puzzlelib_tpu.benchmarks.gemmspeed [--sizes 2048,4096] [--tune]
"""

import argparse
import time

import numpy as np


PEAKS = {"float32": 49e12, "bfloat16": 197e12, "int8": 394e12}


def timeFn(fn, iters=20):
    import numpy as _np

    # tiny device->host readback: block_until_ready is a no-op on relayed
    # PJRT backends, a data-dependent 4-byte read is the only honest fence
    _np.asarray(fn()[:1, :1])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _np.asarray(out[:1, :1])
    return (time.perf_counter() - start) / iters


def kernelRate(iters=4):
    """Sustained kernel rate on one (8192, 65536) @ (65536, 8192) bf16 GEMM.

    At K=65536 the HBM traffic (2.1 GB) amortises over 8.8 TFLOP of MXU work
    (<1% of runtime), so this measures the kernel itself rather than the
    memory system — the roofline-gate number.  Operands are generated
    on-device (a 1 GB host upload through the relay takes minutes)."""
    import jax
    import jax.numpy as jnp

    from puzzlelib_tpu.ops.pallas import matmul as pm

    m, n, k = 8192, 8192, 65536

    kA, kB = jax.random.split(jax.random.key(0))
    a = (jax.random.normal(kA, (m, k), jnp.float32) * 0.02).astype(jnp.bfloat16)
    b = (jax.random.normal(kB, (k, n), jnp.float32) * 0.02).astype(jnp.bfloat16)
    np.asarray(a.ravel()[:1])

    from puzzlelib_tpu.benchmarks.timing import deltaBank, marginalTime

    flops = 2.0 * m * n * k
    peak = PEAKS["bfloat16"]

    deltas = deltaBank((8, n), jnp.bfloat16, 8, seed=3)

    # DEFAULT precision is exact for bf16 operands (one MXU pass, f32
    # accumulate); the framework-wide "highest" would force multi-pass.
    # Array deltas + marginal timing: see benchmarks.timing.
    sec = marginalTime(
        lambda i, x, y, d: jnp.dot(
            x, y.at[:8].add(d[i]), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT).astype(x.dtype),
        (a, b, deltas), reps1=2, reps2=6, k=3)
    print("kernel-rate 8192x65536x8192 bf16 | xla    %7.2f TF/s (%4.1f%% peak)" % (
        flops / sec / 1e12, 100 * flops / sec / peak))

    sec = marginalTime(
        lambda i, x, y, d: pm.matmul(x, y.at[:8].add(d[i]),
                                     bm=1024, bn=1024, bk=512),
        (a, b, deltas), reps1=2, reps2=6, k=3)
    print("kernel-rate 8192x65536x8192 bf16 | pallas %7.2f TF/s (%4.1f%% peak)" % (
        flops / sec / 1e12, 100 * flops / sec / peak))

    ai = jax.random.randint(kA, (m, k), -127, 127, jnp.int8)
    bi = jax.random.randint(kB, (k, n), -127, 127, jnp.int8)
    di = jax.random.randint(kA, (8, 8, n), -127, 127, jnp.int8)
    np.asarray(ai.ravel()[:1])

    sec = marginalTime(
        lambda i, x, y, d: jax.lax.dot_general(
            x, y.at[:8].add(d[i]), (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.int32),
        (ai, bi, di), reps1=2, reps2=6, k=3)
    print("kernel-rate 8192x65536x8192 int8 | xla    %7.2f TOP/s (%4.1f%% peak)" % (
        flops / sec / 1e12, 100 * flops / sec / PEAKS["int8"]))

    try:
        sec = marginalTime(
            lambda i, x, y, d: pm.matmul(x, y.at[:8].add(d[i]),
                                         bm=1024, bn=1024, bk=1024),
            (ai, bi, di), reps1=2, reps2=6, k=3)
        print("kernel-rate 8192x65536x8192 int8 | pallas %7.2f TOP/s (%4.1f%% peak)" % (
            flops / sec / 1e12, 100 * flops / sec / PEAKS["int8"]))
    except Exception as exc:
        print("kernel-rate int8 pallas failed: %s" % str(exc)[:120])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="1024,2048,4096")
    parser.add_argument("--dtypes", default="float32,bfloat16")
    parser.add_argument("--tune", action="store_true", help="print the full tile sweep")
    parser.add_argument("--kernel-rate", action="store_true",
                        help="huge-K single-GEMM sustained-rate measurement (the roofline gate)")
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    if args.kernel_rate:
        from puzzlelib_tpu.backend.device import ensureInit
        from puzzlelib_tpu.benchmarks import enableCompileCache

        ensureInit()
        enableCompileCache()
        kernelRate(max(2, args.iters // 5))
        return

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from puzzlelib_tpu.backend.device import ensureInit
    from puzzlelib_tpu.benchmarks import enableCompileCache
    from puzzlelib_tpu.ops.pallas import matmul as pm

    ensureInit()
    enableCompileCache()

    onTpu = jax.devices()[0].platform not in ("cpu", )
    if not onTpu:
        print("# CPU platform: Pallas timings skipped (interpret mode only)")

    np2dt = {"float32": np.float32, "bfloat16": np.dtype(ml_dtypes.bfloat16),
             "int8": np.int8}

    for size in [int(s) for s in args.sizes.split(",")]:
        for dtname in args.dtypes.split(","):
            dt = np2dt[dtname]
            flops = 2.0 * size ** 3

            if dtname == "int8":
                a = jnp.ones((size, size), dt)
                b = jnp.ones((size, size), dt)
                xla = jax.jit(lambda x, y: jax.lax.dot_general(
                    x, y, (((1, ), (0, )), ((), ())), preferred_element_type=jnp.int32))
            else:
                a = jnp.asarray(np.random.randn(size, size), dt)
                b = jnp.asarray(np.random.randn(size, size), dt)
                xla = jax.jit(lambda x, y: jnp.dot(x, y))

            xlaSec = timeFn(lambda: xla(a, b), args.iters)
            line = "%5d %8s | xla %7.2f TF/s (%4.1f%% peak)" % (
                size, dtname, flops / xlaSec / 1e12, 100 * flops / xlaSec / PEAKS[dtname])

            if dtname != "int8" and onTpu:
                if args.tune:
                    for bm, bn, bk in pm._TILE_CANDIDATES:
                        if bm > size or bn > size or bk > size:
                            continue
                        try:
                            sec = timeFn(lambda: pm.matmul(a, b, bm=bm, bn=bn, bk=bk), args.iters)
                            print("    tile (%4d,%4d,%4d): %7.2f TF/s" % (bm, bn, bk, flops / sec / 1e12))
                        except Exception as exc:
                            print("    tile (%4d,%4d,%4d): failed (%s)" % (bm, bn, bk, str(exc)[:60]))

                tiles = pm.autotune(size, size, size, dtype=dt, iters=max(5, args.iters // 2))
                palSec = timeFn(lambda: pm.matmul(a, b, bm=tiles[0], bn=tiles[1], bk=tiles[2]), args.iters)
                line += " | pallas %7.2f TF/s (%4.1f%% peak, tile %s)" % (
                    flops / palSec / 1e12, 100 * flops / palSec / PEAKS[dtname], tiles)

                # record the winner so eager GEMMs of this shape use it
                # (Config.gemmAlgo="auto" consults this table)
                pm._dispatch[pm.dispatchKey(size, size, size, dt)] = (
                    tiles if palSec < xlaSec else None)
                line += " | dispatch->%s" % ("pallas" if palSec < xlaSec else "xla")

            print(line)


if __name__ == "__main__":
    main()
