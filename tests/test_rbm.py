import numpy as np

from puzzlelib_tpu.backend import gpuarray


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def testRBMGradOracle():
    # Saturate every pre-activation (|pre| >> 1) so the stochastic units are
    # deterministic regardless of the uniform draws; then the CD-1 moment
    # differences are exactly computable in numpy.
    from puzzlelib_tpu.models.misc.rbm import RBM

    vsize, hsize, batch = 6, 4, 5

    rbm = RBM(vsize, hsize)
    np.random.seed(54)  # chosen so every pre-activation saturates (assert below)
    sign = lambda shape: np.random.choice([-1.0, 1.0], size=shape)
    W = (sign((vsize, hsize)) * np.random.uniform(30, 50, (vsize, hsize))).astype(np.float32)
    b = (sign(vsize) * np.random.uniform(30, 50, vsize)).astype(np.float32)
    c = (sign(hsize) * np.random.uniform(30, 50, hsize)).astype(np.float32)
    rbm.W.set(W)
    rbm.b.set(b)
    rbm.c.set(c)

    data = np.random.binomial(1, 0.5, size=(batch, vsize)).astype(np.float32)
    rbm.calcCDGrad(gpuarray.to_gpu(data))

    hData = (data @ W + c > 0).astype(np.float32)
    vModel = (hData @ W.T + b > 0).astype(np.float32)
    hModel = (vModel @ W + c > 0).astype(np.float32)

    # every pre-activation must be far from 0, otherwise units are stochastic
    for pre in (data @ W + c, hData @ W.T + b, vModel @ W + c):
        assert np.min(np.abs(pre)) > 15.0

    assert np.allclose(rbm.vars["W"].grad.get(), data.T @ hData - vModel.T @ hModel)
    assert np.allclose(rbm.vars["b"].grad.get(), data.sum(0) - vModel.sum(0))
    assert np.allclose(rbm.vars["c"].grad.get(), hData.sum(0) - hModel.sum(0))


def testRBMLearns():
    from puzzlelib_tpu.models.misc.rbm import RBM
    from puzzlelib_tpu.optimizers import MomentumSGD

    np.random.seed(4)
    vsize, hsize, batch = 12, 8, 64

    protos = np.zeros((2, vsize), dtype=np.float32)
    protos[0, :vsize // 2] = 1.0
    protos[1, vsize // 2:] = 1.0
    data = protos[np.random.randint(0, 2, size=batch)]

    def reconErr(rbm):
        W, b, c = rbm.W.get(), rbm.b.get(), rbm.c.get()
        probs = sigmoid(sigmoid(data @ W + c) @ W.T + b)
        return float(np.mean((probs - data) ** 2))

    rbm = RBM(vsize, hsize, wscale=0.5)
    opt = MomentumSGD(learnRate=0.02 / batch, momRate=0.9)
    opt.setupOn(rbm)

    before = reconErr(rbm)
    gpudata = gpuarray.to_gpu(data)
    for _ in range(120):
        rbm.calcCDGrad(gpudata)
        opt.update()
    afterCD = reconErr(rbm)
    assert afterCD < before * 0.5, (before, afterCD)

    # PCD path: particles persist and track the hidden batch shape
    rbm2 = RBM(vsize, hsize, wscale=0.5)
    opt2 = MomentumSGD(learnRate=0.02 / batch, momRate=0.9)
    opt2.setupOn(rbm2)
    for _ in range(120):
        rbm2.calcPCDGrad(gpudata)
        opt2.update()
    assert rbm2.particles.shape == (batch, hsize)
    assert reconErr(rbm2) < before * 0.7


def testRBMSamplers():
    from puzzlelib_tpu.models.misc.rbm import RBM

    np.random.seed(5)
    rbm = RBM(7, 3, useBias=False)

    v = gpuarray.to_gpu(np.random.binomial(1, 0.5, size=(4, 7)).astype(np.float32))
    h = rbm.hiddenFromVisible(v)
    assert h.shape == (4, 3)
    assert set(np.unique(h.get())) <= {0.0, 1.0}

    v2 = rbm.visibleFromHidden(h)
    assert v2.shape == (4, 7)
    assert set(np.unique(v2.get())) <= {0.0, 1.0}
