"""Finite-difference gradient checks - the BASELINE acceptance oracle."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.cost import BCE, CrossEntropy, MSE


def relErrors(mod, data, target, cost, h=1e-3):
    from testlib.gradientcheck import gradientCheck
    return gradientCheck(mod, data, target, cost, h=h, log=False)


def testConvBnNetGradients():
    np.random.seed(0)

    from testlib.gradientcheck import buildNet
    net = buildNet()

    data = gpuarray.to_gpu(np.random.randn(1, 1, 6, 6).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randint(0, 2, size=(1, )).astype(np.int32))

    errors = relErrors(net, data, target, BCE())
    assert np.median(errors) < 1e-2, "median rel error %s" % np.median(errors)


def testMlpCrossEntropyGradients():
    np.random.seed(1)

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, tanh

    net = Sequential()
    net.append(Linear(6, 5))
    net.append(Activation(tanh))
    net.append(Linear(5, 3))

    data = gpuarray.to_gpu(np.random.randn(4, 6).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randint(0, 3, size=(4, )).astype(np.int32))

    errors = relErrors(net, data, target, CrossEntropy())
    assert np.median(errors) < 1e-2


def testRnnGradients():
    np.random.seed(2)

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import RNN, Linear

    net = Sequential()
    net.append(RNN(4, 5, mode="gru"))
    net.append(Linear(5, 2))

    data = gpuarray.to_gpu(np.random.randn(3, 2, 4).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randn(2, 2).astype(np.float32))

    errors = relErrors(net, data, target, MSE())
    assert np.median(errors) < 1e-2
