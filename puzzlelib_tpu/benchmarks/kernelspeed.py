"""Kernel micro-benchmarks: upsample, matvec/matsum, batched gemm.

Reference analogue: /root/reference/Cuda/Kernels/Upsample.py:648-659 and
/root/reference/Cuda/Kernels/MatVec.py:468-495 print per-kernel timings when
run as scripts; here one module times the same kernels through the backend
dispatch surface on whatever device Config.backend selects.

Run:  python -m puzzlelib_tpu.benchmarks.kernelspeed
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.kernels import matvec, upsample


def timeIt(fn, sync, warmup=3, iters=20):
    import time

    for _ in range(warmup):
        fn()
    sync()

    start = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()

    return (time.perf_counter() - start) / iters


def benchUpsample():
    import jax

    for nd, shape, scale in ((2, (32, 16, 64, 64), 2), (3, (16, 8, 16, 32, 32), 2)):
        data = gpuarray.to_gpu(np.random.randn(*shape).astype(np.float32))

        fn = upsample.upsample2d if nd == 2 else upsample.upsample3d
        out = fn(data, scale, mode="nearest")

        secs = timeIt(lambda: fn(data, scale, mode="nearest"), lambda: np.asarray(out.jax.ravel()[:1]))
        gbps = (data.nbytes + out.nbytes) / secs / 1e9
        print("upsample%dd nearest %s x%d: %.3f ms (%.1f GB/s)" % (nd, shape, scale, secs * 1e3, gbps))


def benchMatVec():
    import jax

    A = gpuarray.to_gpu(np.random.randn(4096, 4096).astype(np.float32))
    v = gpuarray.to_gpu(np.random.randn(4096).astype(np.float32))

    out = matvec.addVecToMat(v, A, axis=1)
    secs = timeIt(lambda: matvec.addVecToMat(v, A, axis=1, out=out), lambda: np.asarray(out.jax.ravel()[:1]))
    print("addVecToMat 4096x4096: %.3f ms (%.1f GB/s)" % (secs * 1e3, 2 * A.nbytes / secs / 1e9))

    outsum = Blas.sumOnMatrix(A, cols=True)
    secs = timeIt(lambda: Blas.sumOnMatrix(A, out=outsum, cols=True), lambda: np.asarray(outsum.jax.ravel()[:1]))
    print("matsum cols 4096x4096: %.3f ms (%.1f GB/s)" % (secs * 1e3, A.nbytes / secs / 1e9))

    outmax = matvec.argmax(A, axis=1)
    secs = timeIt(lambda: matvec.argmax(A, axis=1), lambda: np.asarray(outmax.jax.ravel()[:1]))
    print("argmax rows 4096x4096: %.3f ms (%.1f GB/s)" % (secs * 1e3, A.nbytes / secs / 1e9))


def benchBatchedGemm():
    import jax

    for groups, size in ((16, 512), (64, 256)):
        A = gpuarray.to_gpu(np.random.randn(groups, size, size).astype(np.float32))
        B = gpuarray.to_gpu(np.random.randn(groups, size, size).astype(np.float32))

        out = Blas.mulTensorBatch(A, B, formatA="gbp", formatB="gbp", formatOut="gbp")
        secs = timeIt(
            lambda: Blas.mulTensorBatch(A, B, formatA="gbp", formatB="gbp", formatOut="gbp", out=out),
            lambda: np.asarray(out.jax.ravel()[:1])
        )
        tflops = 2 * groups * size**3 / secs / 1e12
        print("batched gemm %dx(%dx%d): %.3f ms (%.2f TFLOP/s)" % (groups, size, size, secs * 1e3, tflops))


def main():
    from puzzlelib_tpu.backend.device import ensureInit
    from puzzlelib_tpu.benchmarks import enableCompileCache

    ensureInit()
    enableCompileCache()

    benchUpsample()
    benchMatVec()
    benchBatchedGemm()


if __name__ == "__main__":
    main()
