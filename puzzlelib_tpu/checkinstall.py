"""Environment probe (reference: /root/reference/Cuda/CheckInstall.py).

Validates that the JAX backend initializes, a kernel compiles and runs on the
selected device, and core numeric paths agree with numpy.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from puzzlelib_tpu.backend import gpuarray, blas as Blas, dnn as Dnn
    from puzzlelib_tpu import config as Config

    print("Backend config: %s" % Config.backend)
    print("Devices: %s" % jax.devices())
    print("Default device kind: %s" % jax.devices()[0].device_kind)

    # compile + run a probe kernel
    x = gpuarray.to_gpu(np.random.randn(64, 64).astype(np.float32))
    y = Blas.mulMatrixOnMatrix(x, x)
    assert np.allclose(y.get(), x.get() @ x.get(), atol=1e-3)
    print("GEMM probe: ok")

    data = gpuarray.to_gpu(np.random.randn(2, 3, 16, 16).astype(np.float32))
    W = gpuarray.to_gpu(np.random.randn(4, 3, 3, 3).astype(np.float32))
    out = Dnn.convNd(data, W, None, (1, 1), (1, 1), (1, 1), 1)
    assert out.shape == (2, 4, 16, 16)
    print("Conv probe: ok")

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(inref, outref):
            outref[...] = inref[...] * 2.0

        probe = jnp.ones((8, 128), jnp.float32)
        result = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(probe.shape, probe.dtype)
        )(probe)
        assert np.allclose(np.asarray(result), 2.0)
        print("Pallas probe: ok")

    except Exception as e:
        print("Pallas probe: unavailable on this platform (%s)" % e)

    print("Install check passed")


if __name__ == "__main__":
    main()
