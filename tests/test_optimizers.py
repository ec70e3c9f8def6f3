import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.variable import Variable


class _OneVarModule:
    """Minimal module-protocol stand-in holding one variable."""

    def __init__(self, w, grad):
        self.var = Variable(gpuarray.to_gpu(w), grad=gpuarray.to_gpu(grad))

    def getVarTable(self):
        return {self.var: ["w"]}

    def getVar(self, name):
        return self.var

    def setVar(self, name, var):
        self.var = var


def _runUpdate(optCls, w, grad, steps=1, **kwargs):
    mod = _OneVarModule(w.copy(), grad.copy())

    opt = optCls(**kwargs)
    opt.setupOn(mod, useGlobalState=False)

    for _ in range(steps):
        mod.getVar("w").grad.set(grad)
        opt.update()

    return mod.getVar("w").data.get(), opt


def testSGD():
    from puzzlelib_tpu.optimizers import SGD

    w = np.random.RandomState(0).randn(7, 5).astype(np.float32)
    g = np.random.RandomState(1).randn(7, 5).astype(np.float32)

    out, _ = _runUpdate(SGD, w, g, learnRate=0.1)
    assert np.allclose(out, w + 0.1 * g, atol=1e-6)


def testMomentumSGD():
    from puzzlelib_tpu.optimizers import MomentumSGD

    w = np.random.RandomState(0).randn(7, 5).astype(np.float32)
    g = np.random.RandomState(1).randn(7, 5).astype(np.float32)

    out, _ = _runUpdate(MomentumSGD, w, g, steps=2, learnRate=0.1, momRate=0.9)

    mom = 0.9 * (0.1 * g) + 0.1 * g
    ref = w + 0.1 * g + mom
    assert np.allclose(out, ref, atol=1e-5)


def testNesterovSGD():
    from puzzlelib_tpu.optimizers import NesterovSGD

    w = np.random.RandomState(0).randn(4, 4).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 4).astype(np.float32)

    out, _ = _runUpdate(NesterovSGD, w, g, learnRate=0.1, momRate=0.9)

    # first step: mom=0 -> param += mr^2*0 + (1+mr)*lr*g
    ref = w + (1 + 0.9) * 0.1 * g
    assert np.allclose(out, ref, atol=1e-5)


def testAdaGrad():
    from puzzlelib_tpu.optimizers import AdaGrad

    w = np.random.RandomState(0).randn(6, ).astype(np.float32)
    g = np.random.RandomState(1).randn(6, ).astype(np.float32)

    out, _ = _runUpdate(AdaGrad, w, g, learnRate=0.1, epsilon=1e-8)

    h = g * g
    ref = w + 0.1 * g / (np.sqrt(h) + 1e-8)
    assert np.allclose(out, ref, atol=1e-5)


def testAdaDelta():
    from puzzlelib_tpu.optimizers import AdaDelta

    w = np.random.RandomState(0).randn(6, ).astype(np.float32)
    g = np.random.RandomState(1).randn(6, ).astype(np.float32)

    out, _ = _runUpdate(AdaDelta, w, g, rho=0.95, epsilon=1e-6)

    msg = 0.05 * g * g
    dx = np.sqrt(1e-6 / (msg + 1e-6)) * g
    ref = w + dx
    assert np.allclose(out, ref, atol=1e-5)


def testAdam():
    from puzzlelib_tpu.optimizers import Adam

    w = np.random.RandomState(0).randn(6, ).astype(np.float32)
    g = np.random.RandomState(1).randn(6, ).astype(np.float32)

    out, _ = _runUpdate(Adam, w, g, alpha=0.01, beta1=0.9, beta2=0.999, epsilon=1e-8)

    lr = 0.01 * np.sqrt(1 - 0.999) / (1 - 0.9)
    mg = 0.1 * g
    ms = 0.001 * g * g
    ref = w + lr * mg / (np.sqrt(ms) + 1e-8)

    assert np.allclose(out, ref, atol=1e-5)


def testRMSProp():
    from puzzlelib_tpu.optimizers import RMSProp

    w = np.random.RandomState(0).randn(6, ).astype(np.float32)
    g = np.random.RandomState(1).randn(6, ).astype(np.float32)

    out, _ = _runUpdate(RMSProp, w, g, learnRate=0.01, factor=0.9, epsilon=1e-5)

    ms = 0.1 * g * g
    ref = w + 0.01 * g / (np.sqrt(ms) + 1e-5)
    assert np.allclose(out, ref, atol=1e-5)


def testRMSPropGraves():
    from puzzlelib_tpu.optimizers import RMSPropGraves

    w = np.random.RandomState(0).randn(6, ).astype(np.float32)
    g = np.random.RandomState(1).randn(6, ).astype(np.float32)

    out, _ = _runUpdate(RMSPropGraves, w, g, learnRate=1e-4, alpha=0.95, momRate=0.9, epsilon=1e-4)

    ms = 0.05 * g * g
    mg = 0.05 * g
    delta = 1e-4 * g / np.sqrt(ms - mg * mg + 1e-4)
    ref = w + delta
    assert np.allclose(out, ref, atol=1e-6)


def testSMORMS3():
    from puzzlelib_tpu.optimizers import SMORMS3

    w = np.random.RandomState(0).randn(6, ).astype(np.float32)
    g = np.random.RandomState(1).randn(6, ).astype(np.float32)

    out, _ = _runUpdate(SMORMS3, w, g, learnRate=1e-3, epsilon=1e-16)

    r = 1.0 / 2.0
    mg = r * g
    ms = r * g * g
    x = mg * mg / (ms + 1e-16)
    ref = w + g * np.minimum(1e-3, x) / (np.sqrt(ms) + 1e-16)
    assert np.allclose(out, ref, atol=1e-6)


def testWeightDecayHook():
    from puzzlelib_tpu.optimizers import SGD, WeightDecay

    w = np.ones((4, ), np.float32)
    g = np.zeros((4, ), np.float32)

    mod = _OneVarModule(w, g)
    mod.var.wc = 1.0

    opt = SGD(learnRate=0.1)
    opt.addHook(WeightDecay(0.5))
    opt.setupOn(mod, useGlobalState=False)

    opt.update()

    # grad -= rate*wc*param -> grad = -0.5; param += lr*grad = 1 - 0.05
    assert np.allclose(mod.getVar("w").data.get(), 0.95, atol=1e-6)


def testGradClipHook():
    from puzzlelib_tpu.optimizers import SGD, GradClip

    w = np.zeros((4, ), np.float32)
    g = np.full((4, ), 3.0, np.float32)        # |g| = 6.0

    mod = _OneVarModule(w, g)
    opt = SGD(learnRate=1.0)
    opt.addHook(GradClip(1.5))
    opt.setupOn(mod, useGlobalState=False)

    opt.update()

    # grad rescaled to norm 1.5 -> each element 3 * (1.5/6) = 0.75; param += lr*grad
    assert np.allclose(mod.getVar("w").data.get(), 0.75, atol=1e-6)

    # below the threshold the gradient passes through untouched
    w2 = np.zeros((4, ), np.float32)
    g2 = np.full((4, ), 0.5, np.float32)       # |g| = 1.0 < 1.5

    mod2 = _OneVarModule(w2, g2)
    opt2 = SGD(learnRate=1.0)
    opt2.addHook(GradClip(1.5))
    opt2.setupOn(mod2, useGlobalState=False)

    opt2.update()
    assert np.allclose(mod2.getVar("w").data.get(), 0.5, atol=1e-6)


def testOptimizerStateSaveLoad(tmp_path):
    from puzzlelib_tpu.optimizers import Adam

    np.random.seed(0)
    w = np.random.randn(6, ).astype(np.float32)
    g = np.random.randn(6, ).astype(np.float32)

    out, opt = _runUpdate(Adam, w, g, steps=3, alpha=0.01)

    path = str(tmp_path / "opt.hdf")
    opt.save(path)

    _, opt2 = _runUpdate(Adam, w, g, steps=1, alpha=0.01)
    opt2.load(path)

    assert opt2.t == opt.t

    for name in opt.states:
        for entity in opt.states[name]:
            assert np.allclose(opt2.states[name][entity].get(), opt.states[name][entity].get())


def testCustomUpdaterVariable():
    """A Variable(updater=...) is excluded from framework-managed state and
    its callable runs once per optimizer.update with the global learn rate
    (reference /root/reference/Optimizers/Optimizer.py:154-156)."""
    from puzzlelib_tpu.optimizers import SGD

    np.random.seed(40)
    w = np.random.randn(4, 3).astype(np.float32)
    g = np.random.randn(4, 3).astype(np.float32)

    calls = []

    def myUpdater(var, learnRate):
        calls.append(learnRate)
        var.data.set(var.data.get() - 0.5 * learnRate * np.ones_like(w))

    class _TwoVarModule:
        def __init__(self):
            self.vars = {
                "w": Variable(gpuarray.to_gpu(w), grad=gpuarray.to_gpu(g)),
                "c": Variable(gpuarray.to_gpu(w.copy()), updater=myUpdater),
            }

        def getVarTable(self):
            return {self.vars["w"]: ["w"], self.vars["c"]: ["c"]}

        def getVar(self, name):
            return self.vars[name]

        def setVar(self, name, var):
            self.vars[name] = var

    mod = _TwoVarModule()
    opt = SGD(learnRate=0.1)
    opt.setupOn(mod, useGlobalState=False)

    # the custom var owns no framework state and no grad buffer
    assert list(opt.states.keys()) == ["w"]
    assert opt.customVars == ["c"]
    assert not hasattr(mod.getVar("c"), "grad")

    for _ in range(2):
        mod.getVar("w").grad.set(g)
        opt.update()

    assert calls == [0.1, 0.1]
    assert np.allclose(mod.getVar("c").data.get(), w - 2 * 0.5 * 0.1, atol=1e-6)
    # the managed var still took the plain SGD steps (w += lr*g: costs emit
    # descent-signed gradients, same convention as the reference)
    assert np.allclose(mod.getVar("w").data.get(), w + 2 * 0.1 * g, atol=1e-5)
