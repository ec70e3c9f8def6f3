import numpy as np
import jax.numpy as jnp


def testPallasMatmulInterpret():
    from puzzlelib_tpu.ops.pallas.matmul import matmul, matmulPadded

    np.random.seed(0)
    a = jnp.asarray(np.random.randn(256, 384), jnp.float32)
    b = jnp.asarray(np.random.randn(384, 256), jnp.float32)

    out = matmul(a, b, bm=128, bn=128, bk=128, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(a) @ np.asarray(b), atol=1e-4)


def testPallasMatmulPadding():
    from puzzlelib_tpu.ops.pallas.matmul import matmulPadded

    np.random.seed(1)
    a = jnp.asarray(np.random.randn(100, 200), jnp.float32)
    b = jnp.asarray(np.random.randn(200, 60), jnp.float32)

    out = matmulPadded(a, b, bm=128, bn=128, bk=128, interpret=True)
    assert out.shape == (100, 60)
    assert np.allclose(np.asarray(out), np.asarray(a) @ np.asarray(b), atol=1e-4)


def testGemmAlgoDispatch():
    from puzzlelib_tpu import config as Config
    from puzzlelib_tpu.backend import gpuarray, blas as Blas

    np.random.seed(2)
    A = gpuarray.to_gpu(np.random.randn(64, 128).astype(np.float32))
    B = gpuarray.to_gpu(np.random.randn(128, 64).astype(np.float32))

    ref = Blas.mulMatrixOnMatrix(A, B).get()

    prev = Config.gemmAlgo
    try:
        Config.gemmAlgo = "pallas"
        out = Blas.mulMatrixOnMatrix(A, B).get()
    finally:
        Config.gemmAlgo = prev

    assert np.allclose(out, ref, atol=1e-4)
