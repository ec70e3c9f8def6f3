import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray


def _softmax(x):
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def testBCE():
    from puzzlelib_tpu.cost import BCE

    np.random.seed(0)
    scores = np.random.randn(16, 1).astype(np.float32)
    labels = np.random.randint(0, 2, size=(16, )).astype(np.int32)

    bce = BCE()
    error, grad = bce(gpuarray.to_gpu(scores), gpuarray.to_gpu(labels))

    prob = 1.0 / (1.0 + np.exp(-scores.ravel()))
    refErr = np.where(labels == 1, -np.log(prob), -np.log(1 - prob)).sum() / 16
    refGrad = ((labels == 1).astype(np.float32) - prob)[:, None] / 16

    assert np.isclose(error, refErr, rtol=1e-4)
    assert np.allclose(grad.get(), refGrad, atol=1e-5)

    val = bce.validate(gpuarray.to_gpu(scores), gpuarray.to_gpu(labels))
    refVal = np.where(labels == 1, prob <= 0, prob > 0.5).astype(np.float32)
    assert 0.0 <= val <= 1.0


def testHinge():
    from puzzlelib_tpu.cost import Hinge

    np.random.seed(1)
    scores = np.random.randn(8, 4).astype(np.float32)
    labels = (np.random.randint(0, 2, size=(8, 4)) * 2 - 1).astype(np.int32)

    hinge = Hinge()
    error, grad = hinge(gpuarray.to_gpu(scores), gpuarray.to_gpu(labels))

    refErr = np.maximum(0, 1 - scores * labels).sum() / 4 / 8
    refGrad = np.where(scores * labels < 1, labels / 8 / 4, 0).astype(np.float32)

    assert np.isclose(error, refErr, rtol=1e-4)
    assert np.allclose(grad.get(), refGrad, atol=1e-6)


def testSmoothL1():
    from puzzlelib_tpu.cost import SmoothL1

    np.random.seed(2)
    pred = np.random.randn(10, 10).astype(np.float32)
    target = np.random.randn(10, 10).astype(np.float32)

    cost = SmoothL1()
    cost(gpuarray.to_gpu(pred), gpuarray.to_gpu(target))

    diff = pred - target
    refGrad = (np.where(np.abs(diff) >= 1.0, np.sign(diff), diff) / pred.size).astype(np.float32)
    assert np.allclose(cost.grad.get(), refGrad, atol=1e-6)

    refErr = np.mean(np.where(np.abs(diff) >= 1.0, np.abs(diff) - 0.5, diff ** 2 / 2))
    assert np.isclose(cost.error, refErr, rtol=1e-4)


def testL1Hinge():
    from puzzlelib_tpu.cost import L1Hinge

    np.random.seed(3)
    x1 = np.random.randn(6, 5).astype(np.float32)
    x2 = np.random.randn(6, 5).astype(np.float32)
    labels = np.random.randint(0, 2, size=(6, )).astype(np.int32)

    cost = L1Hinge()
    error, grad = cost([gpuarray.to_gpu(x1), gpuarray.to_gpu(x2)], gpuarray.to_gpu(labels))

    d = x1 - x2
    absd = np.abs(d)
    refErr = np.where(labels[:, None] == 0, np.maximum(0, 1 - absd), absd).sum() / 5 / 6

    assert np.isclose(error, refErr, rtol=1e-4)
    assert len(grad) == 2 and grad[0].shape == x1.shape

    val = cost.validate([gpuarray.to_gpu(x1), gpuarray.to_gpu(x2)], gpuarray.to_gpu(labels))
    assert 0.0 <= val <= 1.0


def testSVM():
    from puzzlelib_tpu.cost import SVM

    np.random.seed(4)
    scores = np.random.randn(8, 5).astype(np.float32)
    labels = np.random.randint(0, 5, size=(8, )).astype(np.int32)

    for mode in ("l1", "l2"):
        cost = SVM(mode=mode)
        error, grad = cost(gpuarray.to_gpu(scores), gpuarray.to_gpu(labels))

        cls = np.where(labels[:, None] == np.arange(5)[None], 1.0, -1.0)
        margin = 1.0 - scores * cls

        if mode == "l1":
            refErr = np.maximum(margin, 0).sum() / 5 / 8
            refGrad = np.where(margin > 0, cls / 5 / 8, 0)
        else:
            hinge = np.maximum(margin, 0)
            refErr = (hinge ** 2).sum() / 5 / 8
            refGrad = 2 * cls * hinge / 5 / 8

        assert np.isclose(error, refErr, rtol=1e-4)
        assert np.allclose(grad.get(), refGrad, atol=1e-5)


def testKLDivergence():
    from puzzlelib_tpu.cost import KLDivergence

    np.random.seed(5)
    pred = np.random.randn(6, 8).astype(np.float32)
    target = np.abs(np.random.randn(6, 8).astype(np.float32))
    target /= target.sum(axis=1, keepdims=True)

    cost = KLDivergence()
    error, grad = cost(gpuarray.to_gpu(pred), gpuarray.to_gpu(target))

    p = _softmax(pred)
    refErr = (target * (np.log(target) - np.log(p))).sum() / 6
    refGrad = (target - p) / 6

    assert np.isclose(error, refErr, rtol=1e-3)
    assert np.allclose(grad.get(), refGrad, atol=1e-5)


def testAbs():
    from puzzlelib_tpu.cost import Abs

    np.random.seed(6)
    pred = np.random.randn(8, 4).astype(np.float32)
    target = np.random.randn(8, 4).astype(np.float32)

    cost = Abs()
    error, grad = cost(gpuarray.to_gpu(pred), gpuarray.to_gpu(target))

    refErr = np.abs(pred - target).sum() / 4 / 8
    refGrad = np.where(pred > target, -1.0, 1.0) / pred.size

    assert np.isclose(error, refErr, rtol=1e-4)
    assert np.allclose(grad.get(), refGrad, atol=1e-6)


def testMulti():
    from puzzlelib_tpu.cost import Multi, MSE, CrossEntropy

    np.random.seed(7)

    multi = Multi()
    multi.append(MSE()).append(CrossEntropy())

    pred1 = gpuarray.to_gpu(np.random.randn(4, 3).astype(np.float32))
    target1 = gpuarray.to_gpu(np.random.randn(4, 3).astype(np.float32))

    pred2 = gpuarray.to_gpu(np.random.randn(4, 5).astype(np.float32))
    target2 = gpuarray.to_gpu(np.random.randint(0, 5, size=(4, )).astype(np.int32))

    error, grads = multi([pred1, pred2], [target1, target2])

    assert len(error) == 2 and len(grads) == 2
    assert grads[0].shape == (4, 3) and grads[1].shape == (4, 5)

    mean = multi.getMeanError()
    assert len(mean) == 2


def testCTCAgainstBruteForce():
    """Validate the CTC NLL against brute-force enumeration of alignments."""
    from puzzlelib_tpu.ops.ctc import ctcLoss
    import itertools
    import jax.numpy as jnp

    np.random.seed(8)

    T, B, V = 4, 1, 3
    blank = 0

    data = np.random.randn(T, B, V).astype(np.float32)
    labels = np.array([1, 2], dtype=np.int32)
    lengths = np.array([2], dtype=np.int32)
    datalen = np.array([T], dtype=np.int32)

    err, grad = ctcLoss(jnp.asarray(data), datalen, labels, lengths, blank)

    # brute force: sum probability over all T-length paths collapsing to [1, 2]
    p = np.exp(data[:, 0]) / np.exp(data[:, 0]).sum(axis=1, keepdims=True)

    def collapse(path):
        out, prev = [], None
        for s in path:
            if s != prev and s != blank:
                out.append(s)
            prev = s
        return out

    total = 0.0
    for path in itertools.product(range(V), repeat=T):
        if collapse(path) == [1, 2]:
            prob = 1.0
            for t, s in enumerate(path):
                prob *= p[t, s]
            total += prob

    refNll = -np.log(total)
    assert np.isclose(float(err), refNll, rtol=1e-4), (float(err), refNll)

    # gradient: finite differences through the loss
    h = 1e-3
    for idx in [(0, 0, 1), (2, 0, 0), (3, 0, 2)]:
        dp = data.copy(); dp[idx] += h
        dm = data.copy(); dm[idx] -= h

        ep, _ = ctcLoss(jnp.asarray(dp), datalen, labels, lengths, blank)
        em, _ = ctcLoss(jnp.asarray(dm), datalen, labels, lengths, blank)

        fd = (float(ep) - float(em)) / (2 * h)
        assert np.isclose(-np.asarray(grad)[idx], fd, atol=1e-2), (idx, -np.asarray(grad)[idx], fd)


def testCTCHostOracleAgreement():
    """The jitted ctcLoss must agree with the independent numpy
    forward/backward oracle (hostCTCLoss) on variable-length batches."""
    import jax.numpy as jnp
    from puzzlelib_tpu.ops.ctc import ctcLoss, hostCTCLoss

    np.random.seed(7)
    T, B, V = 11, 4, 6
    blank = 0

    data = np.random.randn(T, B, V).astype(np.float32)
    datalen = np.array([11, 9, 7, 5], np.int32)
    lengths = np.array([4, 3, 2, 1], np.int32)
    labels = np.concatenate([
        np.array([1, 2, 2, 3], np.int32),
        np.array([4, 1, 5], np.int32),
        np.array([2, 3], np.int32),
        np.array([5], np.int32),
    ])

    err, grad = ctcLoss(jnp.asarray(data), datalen, labels, lengths, blank)
    hostErr, hostGrad, _ = hostCTCLoss(data, datalen, labels, lengths, blank)

    assert np.isclose(float(err), hostErr, rtol=1e-4), (float(err), hostErr)
    assert np.allclose(-np.asarray(grad), hostGrad, atol=5e-4), \
        float(np.abs(-np.asarray(grad) - hostGrad).max())
