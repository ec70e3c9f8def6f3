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


def bceKer(scores, labels, error, grad, numsamples=None, spatialDim=None):
    err, g = _cost.bce(scores.jax, labels.jax)
    error._write(error.jax + err)
    grad._write(g)
    return error, grad


def hingeKer(scores, labels, error, grad, numsamples=None, numcases=None):
    err, g = _cost.hinge(scores.jax, labels.jax)
    error._write(error.jax + err)
    grad._write(g)
    return error, grad


def smoothL1Ker(pred, target, error, grad, norm, fullnorm):
    err, g = _cost.smoothL1(pred.jax, target.jax, norm, fullnorm)
    error._write(error.jax + err)
    grad._write(g)
    return error, grad


def l1HingeKer(x1, x2, labels, error, g1, g2, numsamples=None, numcases=None):
    err, grad1, grad2 = _cost.l1Hinge(x1.jax, x2.jax, labels.jax)
    error._write(error.jax + err)
    g1._write(grad1)
    g2._write(grad2)
    return error, g1, g2


def _calcAccuracy(pred, labels, allocator=None):
    return GPUArray(_cost.accuracy(pred.jax, labels.jax))


def _calcBCEAccuracy(scores, labels, allocator=None):
    import jax.numpy as jnp
    x, y = scores.jax.ravel(), labels.jax.ravel()
    wrong = jnp.where(y == 1, x <= 0.0, x > 0.0)
    return GPUArray(jnp.sum(wrong).astype(jnp.float32))


def _l1HingeAccuracy(dist, labels, allocator=None):
    import jax.numpy as jnp
    d, y = dist.jax, labels.jax
    wrong = (d <= 1.0) != (y.astype(bool))
    return GPUArray(jnp.sum(wrong).astype(jnp.float32))


def _klDivergence(softmax, target, grad, gradnorm, allocator=None):
    import jax.numpy as jnp

    # flat elementwise pairing (softmax may carry trailing singleton dims)
    x = softmax.jax.astype(jnp.float32).reshape(grad.shape)
    y = target.jax.astype(jnp.float32).reshape(grad.shape)

    grad._write(((y - x) * gradnorm).astype(grad.dtype))

    err = jnp.sum(jnp.where(y > 0.0, y * (jnp.log(jnp.maximum(y, 1e-38)) - jnp.log(jnp.maximum(x, 1e-38))), 0.0))
    return GPUArray(err)


def getAccuracyKernel(name):
    return {
        "calcAccuracy": _calcAccuracy,
        "calcBCEAccuracy": _calcBCEAccuracy,
        "l1HingeAccuracy": _l1HingeAccuracy,
        "klDivergence": _klDivergence,
    }[name]


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
