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


def testPallasConvInterpret():
    from puzzlelib_tpu.ops.pallas.conv import conv2d

    np.random.seed(3)
    x = jnp.asarray(np.random.randn(3, 16, 10, 14), jnp.float32)
    w = jnp.asarray(np.random.randn(8, 16, 3, 5), jnp.float32)

    out = conv2d(x, w, (1, 2), interpret=True)

    # float64 host oracle (the lax CPU reference itself runs bf16-emulated dots)
    xn = np.pad(np.asarray(x, np.float64), ((0, 0), (0, 0), (1, 1), (2, 2)))
    wn = np.asarray(w, np.float64)
    ref = np.zeros((3, 8, 10, 14))

    for i in range(3):
        for j in range(5):
            ref += np.einsum("nchw,oc->nohw", xn[:, :, i:i + 10, j:j + 14], wn[:, :, i, j])

    assert out.shape == (3, 8, 10, 14)
    assert np.allclose(np.asarray(out), ref, atol=1e-4)


def testPallasConvStaggered():
    from puzzlelib_tpu.ops.pallas.conv import conv2d

    np.random.seed(4)
    x = jnp.asarray(np.random.randn(2, 8, 12, 12), jnp.float32)
    w = jnp.asarray(np.random.randn(8, 8, 3, 3), jnp.float32)

    base = conv2d(x, w, (0, 0), r=1, interpret=True)
    stag = conv2d(x, w, (0, 0), r=2, interpret=True)

    assert np.allclose(np.asarray(base), np.asarray(stag), atol=1e-4)


def testPallasConvApplicable():
    from puzzlelib_tpu.ops.pallas.conv import applicable

    assert applicable((128, 32, 64, 64), (64, 32, 11, 11), (1, 1), (0, 0), (1, 1), 1)
    assert not applicable((128, 32, 64, 64), (64, 32, 11, 11), (2, 2), (0, 0), (1, 1), 1)
    assert not applicable((128, 3, 64, 64), (64, 3, 11, 11), (1, 1), (0, 0), (1, 1), 1)  # c % 8
    assert not applicable((8, 16, 8, 8), (16, 16, 3, 3), (1, 1), (0, 0), (1, 1), 2)      # groups
