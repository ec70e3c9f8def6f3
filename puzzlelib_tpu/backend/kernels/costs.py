"""Cost kernel dispatch (reference: /root/reference/Backend/Kernels/Costs.py)."""

import numpy as np

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import cost as _cost


def crossEntropyKernel(scores, labels, weights=None, error=None):
    err, grad = _cost.crossEntropy(
        scores.jax, labels.jax, weights.jax if weights is not None else None, hasWeights=weights is not None
    )

    if error is None:
        error = GPUArray.empty((), np.float32)

    error._write(err)
    return error, GPUArray(grad)


def svmKernel(scores, labels, mode="l1", error=None):
    err, grad = _cost.svm(scores.jax, labels.jax, mode=mode)

    if error is None:
        error = GPUArray.empty((), np.float32)

    error._write(err)
    return error, GPUArray(grad)


def _bceKer(scores, labels, error, grad):
    err, g = _cost.bce(scores.jax, labels.jax)
    error._write(error.jax + err)
    grad._write(g)
    return error, grad


def _hingeKer(scores, labels, error, grad):
    err, g = _cost.hinge(scores.jax, labels.jax)
    error._write(error.jax + err)
    grad._write(g)
    return error, grad


def _smoothL1Ker(pred, target, error, grad, norm, fullnorm):
    err, g = _cost.smoothL1(pred.jax, target.jax, norm, fullnorm)
    error._write(error.jax + err)
    grad._write(g)
    return error, grad


def _l1HingeKer(x1, x2, labels, error, g1, g2):
    err, grad1, grad2 = _cost.l1Hinge(x1.jax, x2.jax, labels.jax)
    error._write(error.jax + err)
    g1._write(grad1)
    g2._write(grad2)
    return error, g1, g2


def bceKer(dtype):
    return _bceKer


def hingeKer(dtype):
    return _hingeKer


def smoothL1Ker(dtype):
    return _smoothL1Ker


def l1HingeKer(dtype):
    return _l1HingeKer


def _calcAccuracy(pred, labels, allocator=None):
    return GPUArray(_cost.accuracy(pred.jax, labels.jax))


def getAccuracyKernel(name):
    assert name == "calcAccuracy"
    return _calcAccuracy


def ctcLoss(data, datalen, labels, lengths, blank, error=None, normalized=False):
    from puzzlelib_tpu.ops import ctc as _ctc

    err, grad = _ctc.ctcLoss(data.jax, datalen.jax, labels.jax, lengths.jax, blank, normalized)

    if error is None:
        error = GPUArray.empty((), np.float32)

    error._write(err)
    return error, GPUArray(grad)


def ctcLossTest(data, datalen, labels, lengths, blank):
    from puzzlelib_tpu.ops import ctc as _ctc
    return _ctc.hostCTCLoss(data, datalen, labels, lengths, blank)
