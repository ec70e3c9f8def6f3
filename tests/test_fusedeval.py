"""FusedValidator / FusedCalculator equivalence with the eager handlers.

The eager Validator/Calculator dispatch one executable per module op
(reference execution model, /root/reference/Handlers/Validator.py); the fused
variants compile the eval forward (+ traced cost validation, Cost.calcValDev)
into one program per batch.  Numerics must be identical.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import (
    Conv2D, MaxPool2D, Activation, relu, Flatten, Linear, BatchNorm2D, Dropout
)
from puzzlelib_tpu.cost import CrossEntropy, MSE, BCE, Hinge, SmoothL1, Multi
from puzzlelib_tpu.handlers import Validator, Calculator
from puzzlelib_tpu.fused import FusedValidator, FusedCalculator


def buildNet(outs=10):
    np.random.seed(42)
    seq = Sequential()
    seq.append(Conv2D(1, 4, 3))
    seq.append(BatchNorm2D(4))          # attrs (running stats) ride the program
    seq.append(MaxPool2D())
    seq.append(Activation(relu))
    seq.append(Dropout(0.5))            # eval mode: identity
    seq.append(Flatten())
    seq.append(Linear(4 * 5 * 5, outs))
    return seq


def classData(n=70):
    np.random.seed(3)
    data = np.random.randn(n, 1, 12, 12).astype(np.float32)
    labels = np.random.randint(0, 10, size=(n, )).astype(np.int32)
    return data, labels


def testFusedValidatorMatchesEager():
    data, labels = classData()

    net = buildNet()
    eager = Validator(net, CrossEntropy(), batchsize=32)
    ref = eager.validateFromHost(data, labels)

    netF = buildNet()                   # same seed -> identical weights
    fused = FusedValidator(netF, CrossEntropy(), batchsize=32)
    got = fused.validateFromHost(data, labels)

    assert isinstance(got, float)
    assert abs(got - ref) < 1e-6

    # second call reuses the cached executable (incl. the ragged last batch)
    assert abs(fused.validateFromHost(data, labels) - ref) < 1e-6

    # the net remains usable eagerly afterwards (no leaked tracers)
    out = netF(gpuarray.to_gpu(data[:4]))
    assert np.isfinite(np.asarray(out.jax)).all()
    netF.reset()


def testFusedValidatorRegression():
    np.random.seed(5)
    data = np.random.randn(50, 1, 12, 12).astype(np.float32)
    target = np.random.randn(50, 6).astype(np.float32)

    for costType in (MSE, SmoothL1):
        net = buildNet(outs=6)
        ref = Validator(net, costType(), batchsize=16).validateFromHost(data, target)

        netF = buildNet(outs=6)
        got = FusedValidator(netF, costType(), batchsize=16).validateFromHost(data, target)

        assert abs(got - ref) < 1e-5, costType.__name__


def testFusedValidatorBinaryAndHinge():
    np.random.seed(6)
    data = np.random.randn(40, 1, 12, 12).astype(np.float32)

    net = buildNet(outs=1)
    labels = np.random.randint(0, 2, size=(40, )).astype(np.int32)
    ref = Validator(net, BCE(), batchsize=16).validateFromHost(data, labels)
    netF = buildNet(outs=1)
    got = FusedValidator(netF, BCE(), batchsize=16).validateFromHost(data, labels)
    assert abs(got - ref) < 1e-6

    net = buildNet(outs=5)
    hlabels = np.where(np.random.rand(40, 5) > 0.5, 1, -1).astype(np.int32)
    ref = Validator(net, Hinge(), batchsize=16).validateFromHost(data, hlabels)
    netF = buildNet(outs=5)
    got = FusedValidator(netF, Hinge(), batchsize=16).validateFromHost(data, hlabels)
    assert abs(got - ref) < 1e-6


def testFusedValidatorMultiFallback():
    """Multi cost has no traced validation: the fused validator must fall back
    to the eager per-batch path and still produce the eager answer."""
    from puzzlelib_tpu.modules import Replicate

    data, labels = classData(40)

    def build():
        net = buildNet()
        net.append(Replicate(2))
        return net

    def cost():
        return Multi().append(CrossEntropy()).append(CrossEntropy())

    ref = Validator(build(), cost(), batchsize=16).validateFromHost(data, [labels, labels])

    fused = FusedValidator(build(), cost(), batchsize=16)
    got = fused.validateFromHost(data, [labels, labels])

    assert fused._fallback
    assert isinstance(got, list) and len(got) == 2
    for g, r in zip(got, ref):
        assert abs(g - r) < 1e-6


def testFusedCalculatorMatchesEager():
    data, _ = classData(52)

    net = buildNet()
    ref = Calculator(net, batchsize=16).calcFromHost(data)

    netF = buildNet()
    got = FusedCalculator(netF, batchsize=16).calcFromHost(data)

    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-6)

    # eager reuse after fused tracing
    out = netF(gpuarray.to_gpu(data[:4]))
    assert np.allclose(np.asarray(out.jax), ref[:4], atol=1e-6)
    netF.reset()
