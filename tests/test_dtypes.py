"""Per-dtype tolerance protocol (reference: for dtype, atol in dtypesSupported())."""

import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray


@pytest.mark.parametrize("dtype,atol", gpuarray.dtypesSupported())
def testLinearPerDtype(dtype, atol):
    from puzzlelib_tpu.modules import Linear

    np.random.seed(0)
    insize, outsize = 8, 6

    hostData = np.random.randn(4, insize).astype(dtype)

    linear = Linear(insize, outsize, initscheme=("xavier", "avg"))
    linear.calcMode(dtype)

    out = linear(gpuarray.to_gpu(hostData))

    hostGrad = np.random.randn(4, outsize).astype(dtype)
    linear.backward(gpuarray.to_gpu(hostGrad))

    hostW, hostBias = linear.W.get().astype(np.float32), linear.b.get().astype(np.float32)
    data32, grad32 = hostData.astype(np.float32), hostGrad.astype(np.float32)

    assert np.allclose(out.get().astype(np.float32), data32 @ hostW + hostBias[None], atol=atol)
    assert np.allclose(linear.grad.get().astype(np.float32), grad32 @ hostW.T, atol=atol)
    assert np.allclose(linear.vars["W"].grad.get().astype(np.float32), data32.T @ grad32, atol=atol * 4)


@pytest.mark.parametrize("dtype,atol", gpuarray.dtypesSupported())
def testConvPerDtype(dtype, atol):
    from puzzlelib_tpu.modules import Conv2D

    np.random.seed(1)

    conv = Conv2D(2, 3, 3, pad=1)
    conv.calcMode(dtype)

    hostData = np.random.randn(2, 2, 6, 6).astype(dtype)
    out = conv(gpuarray.to_gpu(hostData))
    assert out.dtype == np.dtype(dtype)

    hostGrad = np.random.randn(*out.shape).astype(dtype)
    conv.backward(gpuarray.to_gpu(hostGrad))
    assert conv.grad.shape == hostData.shape


@pytest.mark.parametrize("dtype,atol", gpuarray.dtypesSupported())
def testActivationPerDtype(dtype, atol):
    from puzzlelib_tpu.modules import Activation, tanh

    np.random.seed(2)

    act = Activation(tanh)
    act.calcMode(dtype)

    hostData = np.random.randn(5, 7).astype(dtype)
    out = act(gpuarray.to_gpu(hostData))

    assert np.allclose(out.get().astype(np.float32), np.tanh(hostData.astype(np.float32)), atol=atol)


@pytest.mark.parametrize("dtype,atol", gpuarray.dtypesSupported())
def testPoolPerDtype(dtype, atol):
    """bf16 regression: ml_dtypes kinds are 'V', not 'f' — max-pool init must not hit np.iinfo."""
    from puzzlelib_tpu.modules import MaxPool2D, AvgPool2D

    np.random.seed(3)
    hostData = np.random.randn(2, 3, 8, 8).astype(dtype)

    for mod in (MaxPool2D(), AvgPool2D()):
        mod.calcMode(dtype)
        out = mod(gpuarray.to_gpu(hostData))
        assert out.dtype == np.dtype(dtype) and out.shape == (2, 3, 4, 4)
        mod.backward(gpuarray.to_gpu(np.random.randn(*out.shape).astype(dtype)))
        assert mod.grad.shape == hostData.shape
