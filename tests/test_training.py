import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.containers import Sequential, Parallel, Graph
from puzzlelib_tpu.modules import (
    Conv2D, MaxPool2D, Activation, relu, sigmoid, Flatten, Linear, BatchNorm2D, Dropout, SoftMax,
    Replicate, Concat, Identity
)
from puzzlelib_tpu.cost import CrossEntropy, MSE
from puzzlelib_tpu.optimizers import MomentumSGD, Adam, SGD, NesterovSGD
from puzzlelib_tpu.handlers import Trainer, Validator, Calculator


def buildLenet():
    seq = Sequential()
    seq.append(Conv2D(1, 4, 3))
    seq.append(MaxPool2D())
    seq.append(Activation(relu))
    seq.append(Flatten())
    seq.append(Linear(4 * 5 * 5, 10))
    return seq


def testSequentialForwardBackward():
    np.random.seed(0)
    seq = buildLenet()

    data = gpuarray.to_gpu(np.random.randn(4, 1, 12, 12).astype(np.float32))
    out = seq(data)
    assert out.shape == (4, 10)

    grad = gpuarray.to_gpu(np.random.randn(4, 10).astype(np.float32))
    seq.backward(grad)
    assert seq.grad.shape == data.shape


def testTrainerLowersLoss():
    np.random.seed(1)
    seq = buildLenet()

    data = np.random.randn(64, 1, 12, 12).astype(np.float32)
    labels = np.random.randint(0, 10, size=(64, )).astype(np.int32)

    cost = CrossEntropy()
    optimizer = MomentumSGD(learnRate=0.05, momRate=0.9)
    optimizer.setupOn(seq, useGlobalState=True)

    trainer = Trainer(seq, cost, optimizer, batchsize=16)

    errors = []
    for epoch in range(15):
        trainer.train(
            gpuarray.to_gpu(data), gpuarray.to_gpu(labels), random=False
        )
        errors.append(cost.getMeanError())

    assert errors[-1] < errors[0] * 0.5, "loss did not decrease: %s" % errors


def testGlobalStateSharedViews():
    np.random.seed(2)
    seq = Sequential()
    seq.append(Linear(8, 4))
    seq.append(Activation(sigmoid))
    seq.append(Linear(4, 2))

    optimizer = SGD(learnRate=0.1)
    optimizer.setupOn(seq, useGlobalState=True)

    # after setup, the module vars are views of the fused buffers
    w0Before = seq[0].W.get().copy()

    data = gpuarray.to_gpu(np.random.randn(4, 8).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randn(4, 2).astype(np.float32))

    mse = MSE()
    _, grad = mse(seq(data), target)

    optimizer.zeroGradParams()
    seq.backward(grad)
    optimizer.update()

    assert not np.allclose(seq[0].W.get(), w0Before), "update did not reach the shared view"


@pytest.mark.parametrize("optCls,kwargs", [
    (Adam, dict(alpha=0.05)),
    (NesterovSGD, dict(learnRate=0.05, momRate=0.9)),
])
def testOptimizersConverge(optCls, kwargs):
    np.random.seed(3)

    seq = Sequential()
    seq.append(Linear(16, 8, useBias=False))
    seq.append(Activation(relu))
    seq.append(Linear(8, 4))

    optimizer = optCls(**kwargs)
    optimizer.setupOn(seq, useGlobalState=True)

    mse = MSE()

    data = gpuarray.to_gpu(np.random.randn(8, 16).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randn(8, 4).astype(np.float32))

    first = None
    for i in range(60):
        error, grad = mse(seq(data), target)

        optimizer.zeroGradParams()
        seq.backward(grad)
        optimizer.update()

        if first is None:
            first = error

    assert error < first * 0.5


def testValidatorCalculator():
    np.random.seed(4)
    seq = buildLenet()

    data = np.random.randn(32, 1, 12, 12).astype(np.float32)
    labels = np.random.randint(0, 10, size=(32, )).astype(np.int32)

    cost = CrossEntropy()
    validator = Validator(seq, cost, batchsize=16)
    err = validator.validateFromHost(data, labels, macroBatchSize=32)
    assert 0.0 <= err <= 1.0

    calculator = Calculator(seq, batchsize=16)
    result = calculator.calcFromHost(data, macroBatchSize=32)
    assert result.shape == (32, 10)


def testGraphMatchesSequentialAndParallel():
    np.random.seed(5)

    def branchedNetData():
        # implicit fan-out: inlin feeds both branches, gradient fan-in sums
        inp = Linear(6, 6, name="inlin").node()

        b1 = Linear(6, 3, name="b1").node(inp)
        b2 = Linear(6, 3, name="b2").node(inp)

        cat = Concat(axis=1, name="cat").node(b1, b2)
        return Graph(inputs=inp, outputs=cat)

    graph = branchedNetData()

    data = gpuarray.to_gpu(np.random.randn(4, 6).astype(np.float32))
    out = graph(data)
    assert out.shape == (4, 6)

    grad = gpuarray.to_gpu(np.random.randn(4, 6).astype(np.float32))
    graph.backward(grad)
    assert graph.grad.shape == (4, 6)

    # oracle: same weights, hand-computed forward
    W0 = graph["inlin"].W.get()
    b0 = graph["inlin"].b.get()
    w1, bb1 = graph["b1"].W.get(), graph["b1"].b.get()
    w2, bb2 = graph["b2"].W.get(), graph["b2"].b.get()

    # note: optimizer update did not run, so weights are the init ones
    hidden = data.get() @ W0 + b0
    expected = np.concatenate([hidden @ w1 + bb1, hidden @ w2 + bb2], axis=1)

    assert np.allclose(out.get(), expected, atol=1e-4)


def testFusedTrainerWithRnnAndBf16Mode():
    """Fused single-executable step through an RNN net; bf16 calcMode accepted."""
    import ml_dtypes
    from puzzlelib_tpu.modules import RNN, Cast
    from puzzlelib_tpu.fused import FusedStep
    from puzzlelib_tpu.optimizers import Adam
    from puzzlelib_tpu.cost import MSE

    np.random.seed(20)

    seq = Sequential()
    seq.append(RNN(6, 8, mode="lstm"))
    seq.append(Linear(8, 4))

    opt = Adam(alpha=0.01)
    opt.setupOn(seq, useGlobalState=True)

    cost = MSE()
    step = FusedStep(seq, cost, opt)

    data = np.random.randn(5, 3, 6).astype(np.float32)
    target = np.random.randn(3, 4).astype(np.float32)

    first = None
    for _ in range(10):
        step(data, target)
        err = cost.getError()
        if first is None:
            first = err

    assert err < first, "fused RNN step did not reduce loss (%s -> %s)" % (first, err)

    # bfloat16 calc mode end-to-end
    bf16 = np.dtype(ml_dtypes.bfloat16).type

    seq16 = Sequential()
    seq16.append(Linear(8, 4))
    seq16.calcMode(bf16)
    seq16.append(Cast(intype="bfloat16", outtype=np.float32))

    x = gpuarray.to_gpu(np.random.randn(2, 8).astype(bf16))
    out = seq16(x)
    assert out.dtype == np.float32 and out.shape == (2, 4)


def testFusedManyMatchesSequentialSteps():
    """K steps via FusedStep.many (one lax.scan dispatch) == K sequential calls."""
    from puzzlelib_tpu.fused import FusedStep
    from puzzlelib_tpu.optimizers import Adam

    np.random.seed(30)

    def build():
        np.random.seed(31)
        seq = Sequential()
        seq.append(Linear(8, 6))
        seq.append(Activation(relu))
        seq.append(Linear(6, 4))
        return seq

    K, b = 4, 8
    data = np.random.randn(K * b, 8).astype(np.float32)
    target = np.random.randn(K * b, 4).astype(np.float32)

    seqA = build()
    optA = Adam(alpha=0.02)
    optA.setupOn(seqA, useGlobalState=True)
    stepA = FusedStep(seqA, MSE(), optA)

    for k in range(K):
        stepA(data[k * b:(k + 1) * b], target[k * b:(k + 1) * b])

    seqB = build()
    optB = Adam(alpha=0.02)
    optB.setupOn(seqB, useGlobalState=True)
    stepB = FusedStep(seqB, MSE(), optB)

    stepB.many(data, target, steps=K)

    assert np.allclose(seqA[0].W.get(), seqB[0].W.get(), atol=1e-6), \
        "many() diverged from sequential steps"
    assert optA.t == optB.t

    import pytest
    with pytest.raises(ValueError, match="divisible"):
        stepB.many(data[:K * b - 1], target[:K * b - 1], steps=K)


def testFusedTrainerStepsPerDispatch():
    """Grouped many()-dispatch trainer: same step count, loss decreases."""
    from puzzlelib_tpu.fused import FusedTrainer
    from puzzlelib_tpu.optimizers import MomentumSGD

    np.random.seed(50)
    seq = Sequential()
    seq.append(Linear(8, 16))
    seq.append(Activation(relu))
    seq.append(Linear(16, 4))

    opt = MomentumSGD(learnRate=0.05)
    opt.setupOn(seq, useGlobalState=True)
    cost = MSE()

    trainer = FusedTrainer(seq, cost, opt, batchsize=16, stepsPerDispatch=2)

    data = np.random.randn(75, 8).astype(np.float32)     # 4 full + 1 partial batch
    target = np.random.randn(75, 4).astype(np.float32)

    errs = []
    for epoch in range(6):
        trainer.trainFromHost(data, target, macroBatchSize=75, random=(epoch % 2 == 0))
        errs.append(cost.getMeanError())

    assert errs[-1] < errs[0]
    assert opt.t == 6 * 5, opt.t


def testFusedManyMatchesSequentialConvDropoutHooks():
    """many() equivalence with the full digitsnin ingredient list: Conv2D,
    MaxPool, Dropout (p=0 so the mask plumbing runs but stays deterministic),
    MomentumSGD + GradClip + WeightDecay hooks, useGlobalState=False."""
    from puzzlelib_tpu.fused import FusedStep
    from puzzlelib_tpu.modules import Conv2D, MaxPool2D, Dropout
    from puzzlelib_tpu.optimizers import WeightDecay, GradClip

    def build():
        np.random.seed(31)
        seq = Sequential()
        seq.append(Conv2D(3, 8, 3, pad=1, initscheme="gaussian", wscale=0.05))
        seq.append(Activation(relu))
        seq.append(Dropout(p=0.0))
        seq.append(MaxPool2D(2, 2))
        seq.append(Conv2D(8, 10, 1, initscheme="gaussian", wscale=0.05))
        seq.append(MaxPool2D(4, 4))
        seq.append(Flatten())
        return seq

    def make():
        net = build()
        opt = MomentumSGD(learnRate=0.1, momRate=0.9)
        opt.addHook(GradClip(1.0))
        opt.addHook(WeightDecay(0.0001))
        opt.setupOn(net, useGlobalState=False)
        return net, FusedStep(net, CrossEntropy(maxlabels=10), opt)

    K, b = 4, 8
    np.random.seed(42)
    data = np.random.randn(K * b, 3, 8, 8).astype(np.float32)
    target = np.random.randint(0, 10, size=K * b).astype(np.int32)

    netA, stepA = make()
    for k in range(K):
        stepA(data[k * b:(k + 1) * b], target[k * b:(k + 1) * b])

    netB, stepB = make()
    stepB.many(data, target, steps=K)

    import jax
    atol = 1e-6 if jax.devices()[0].platform == "cpu" else 1e-5
    for idx in (0, 4):
        assert np.allclose(netA[idx].W.get(), netB[idx].W.get(), atol=atol), \
            "many() diverged from sequential steps at module %d" % idx


def testFusedLocalStateMatchesGlobalState():
    """Per-var optimizer state (the TPU-preferred fused mode: no SharedArray
    flat buffer, no per-step weight relayouts) must be numerically identical
    to the fused-global-state mode."""
    import numpy as np
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv2D, Activation, relu, Flatten, Linear
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep

    def build():
        np.random.seed(33)
        net = Sequential()
        net.append(Conv2D(1, 4, 3)).append(Activation(relu))
        net.append(Flatten()).append(Linear(4 * 6 * 6, 10))
        return net

    np.random.seed(34)
    data = np.random.randn(8, 1, 8, 8).astype(np.float32)
    labels = np.random.randint(0, 10, size=(8, )).astype(np.int32)

    results = []
    for useGlobal in (True, False):
        net = build()
        opt = MomentumSGD(learnRate=0.05, momRate=0.9)
        opt.setupOn(net, useGlobalState=useGlobal)

        step = FusedStep(net, CrossEntropy(), opt)
        for _ in range(4):
            step(data, labels)

        results.append((net[0].W.get(), net[3].W.get()))

    for a, b in zip(*results):
        assert np.allclose(a, b, atol=1e-6), "local/global fused state diverge"


def testFusedHwioCarryMatchesLogical():
    """The channels-last conv-weight carry (Config.fusedConvLayout="hwio") is
    a pure layout rewrite: single steps and many() must reproduce the logical
    OIHW path's trajectory, and user-visible buffers stay (co, c, kh, kw)."""
    from puzzlelib_tpu import config as Config
    from puzzlelib_tpu.fused import FusedStep
    from puzzlelib_tpu.optimizers import MomentumSGD

    K, b = 3, 4
    np.random.seed(40)
    data = np.random.randn((K + 1) * b, 1, 12, 12).astype(np.float32)
    target = np.random.randn((K + 1) * b, 10).astype(np.float32)

    def run(layout):
        saved = Config.fusedConvLayout
        Config.fusedConvLayout = layout
        try:
            np.random.seed(41)
            net = buildLenet()
            opt = MomentumSGD(learnRate=0.05, momRate=0.9)
            opt.setupOn(net, useGlobalState=False)
            step = FusedStep(net, cost := MSE(), opt)

            step(data[:b], target[:b])                       # single step
            step.many(data[b:], target[b:], steps=K)         # scan carry

            assert net[0].W.shape == (4, 1, 3, 3), "user-visible layout changed"
            return net[0].W.get(), net[4].W.get(), cost.getError()
        finally:
            Config.fusedConvLayout = saved

    wH, lH, eH = run("hwio")
    wL, lL, eL = run("oihw")

    assert np.allclose(wH, wL, atol=1e-6), "hwio carry diverged on conv W"
    assert np.allclose(lH, lL, atol=1e-6), "hwio carry diverged on linear W"
    assert abs(eH - eL) < 1e-6
