"""DNN primitive dispatch (reference: /root/reference/Backend/Dnn.py).

Algo enums are retained for API/blueprint compatibility; on TPU they are
scheduling hints only (XLA owns algorithm choice), so every value behaves as
"auto".  ``convNdbenchmark`` times the compiled XLA kernels instead of probing
cuDNN algos.
"""

from enum import Enum

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import conv as _conv
from puzzlelib_tpu.ops import pool as _pool
from puzzlelib_tpu.ops import norm as _norm
from puzzlelib_tpu.ops import softmax as _softmax


class ConvFwdAlgo(Enum):
    auto = 0
    implicitGemm = 1
    implicitPrecompGemm = 2
    gemm = 3
    direct = 4
    fft = 5
    fftTiling = 6
    winograd = 7
    winogradNonfused = 8


class ConvBwdDataAlgo(Enum):
    auto = -1
    algo0 = 0
    algo1 = 1
    fft = 2
    fftTiling = 3
    winograd = 4
    winogradNonfused = 5


class ConvBwdFilterAlgo(Enum):
    auto = -1
    algo0 = 0
    algo1 = 1
    fft = 2
    algo3 = 3
    winogradNonfused = 5
    fftTiling = 6


class PoolMode(Enum):
    max = "max"
    avgWithPad = "avgWithPad"
    avgNoPad = "avgNoPad"
    maxDeterminism = "max"


class BatchNormMode(Enum):
    perActivation = "perActivation"
    spatial = "spatial"
    spatialPersistent = "spatial"


class SoftMaxMode(Enum):
    perActivation = "perActivation"
    spatial = "spatial"


class ConvPerf:
    def __init__(self, algo, tm, memory=0, determinism=True, mathType=None):
        self.algo = algo
        self.time = tm
        self.memory = memory
        self.determinism = determinism
        self.mathType = mathType

    def toString(self):
        return "%-40s %-25s %-28s" % (
            "Algo %s" % self.algo, "time %.6f secs" % self.time, "memory %.6f mbytes" % (self.memory / 1024**2)
        )


def _t(v):
    return tuple(int(x) for x in v)


# -- conv --------------------------------------------------------------------

def convNd(data, W, bias, stride, pad, dilation, groups, algo=None):
    result = _conv.convNd(
        data.jax, W.jax, bias.jax if bias is not None else None,
        _t(stride), _t(pad), _t(dilation), int(groups), hasBias=bias is not None
    )
    return GPUArray(result)


def convNdBackwardData(grad, W, data, stride, pad, dilation, groups, algo=None):
    result = _conv.convNdBackwardData(
        grad.jax, W.jax, tuple(data.shape), _t(stride), _t(pad), _t(dilation), int(groups)
    )
    return GPUArray(result)


def convNdBackwardParams(data, grad, W, bias, stride, pad, dilation, groups,
                         wgrad=None, bgrad=None, scale=1.0, momentum=0.0, algo=None):
    dw, db = _conv.convNdBackwardParams(
        data.jax, grad.jax, W.jax, _t(stride), _t(pad), _t(dilation), int(groups), hasBias=bias is not None
    )

    return _accumulateParamGrads(dw, db, W, bias, wgrad, bgrad, scale, momentum)


def _accumulateParamGrads(dw, db, W, bias, wgrad, bgrad, scale, momentum):
    if wgrad is not None:
        wgrad._write(dw * scale + wgrad.jax * momentum if momentum != 0.0 else dw * scale)
        outw = wgrad
    else:
        outw = GPUArray(dw * scale if scale != 1.0 else dw)

    outb = None
    if db is not None:
        db = db.reshape(bias.shape if bias is not None else db.shape)

        if bgrad is not None:
            bgrad._write(db * scale + bgrad.jax * momentum if momentum != 0.0 else db * scale)
            outb = bgrad
        else:
            outb = GPUArray(db * scale if scale != 1.0 else db)

    return outw if outb is None else (outw, outb)


def convNdbenchmark(datashape, Wshape, stride, pad, dilation, groups, transpose=False,
                    dtype=np.float32):
    """Time the three compiled conv kernels; returns (fwd, bwdFilter, bwdData)
    ConvPerf lists (one entry each: XLA picks the algorithm).

    For Pallas-eligible shapes this also races and persists the measured
    per-shape algo choice for the subsequent training steps (the
    cuDNN-algo-search equivalent, reference: Cuda/GPUBackend.py:371)."""
    import jax
    from puzzlelib_tpu.backend.device import timeKernel

    stride, pad, dilation = _t(stride), _t(pad), _t(dilation)

    if not transpose and len(datashape) == 4 and jax.default_backend() != "cpu":
        # race XLA vs every applicable Pallas kernel (fused Winograd fwd and
        # transform-domain bwd-filter) and persist the per-shape dispatch
        # choice - unmeasured shapes stay on XLA
        _conv.measureAlgoChoice(datashape, Wshape, stride, pad, dilation, groups)

    x = jax.numpy.zeros(datashape, dtype)
    w = jax.numpy.zeros(Wshape, dtype)

    fwd = lambda: _conv.convNd(x, w, None, stride, pad, dilation, groups, hasBias=False)
    grad = fwd()

    bwdData = lambda: _conv.convNdBackwardData(grad, w, tuple(datashape), stride, pad, dilation, groups)
    bwdParams = lambda: _conv.convNdBackwardParams(x, grad, w, stride, pad, dilation, groups, hasBias=False)

    results = []
    for fn in (fwd, bwdParams, bwdData):
        secs = timeKernel(fn, looplength=25, log=False, normalize=True)
        results.append([ConvPerf(ConvFwdAlgo.auto, secs)])

    fwdRes, bwdParamsRes, bwdDataRes = results
    return fwdRes, bwdParamsRes, bwdDataRes


# -- deconv ------------------------------------------------------------------

def deconvNd(data, W, bias, stride, pad, dilation, postpad, groups, algo=None):
    result = _conv.deconvNd(
        data.jax, W.jax, bias.jax if bias is not None else None,
        _t(stride), _t(pad), _t(dilation), _t(postpad), int(groups), hasBias=bias is not None
    )
    return GPUArray(result)


def deconvNdBackwardData(grad, W, data, stride, pad, dilation, groups, algo=None):
    result = _conv.deconvNdBackwardData(grad.jax, W.jax, _t(stride), _t(pad), _t(dilation), int(groups))
    return GPUArray(result)


def deconvNdBackwardParams(data, grad, W, bias, stride, pad, dilation, groups,
                           wgrad=None, bgrad=None, scale=1.0, momentum=0.0, algo=None):
    nd = data.ndim - 2
    dw, db = _conv.deconvNdBackwardParams(
        data.jax, grad.jax, W.jax, _t(stride), _t(pad), _t(dilation), (0, ) * nd, int(groups),
        hasBias=bias is not None
    )

    return _accumulateParamGrads(dw, db, W, bias, wgrad, bgrad, scale, momentum)


# -- pooling -----------------------------------------------------------------

def poolNd(data, size, stride, pad, mode=PoolMode.max, test=False):
    result = _pool.poolNd(data.jax, _t(size), _t(stride), _t(pad), mode.value)
    return GPUArray(result), None


def poolNdBackward(indata, outdata, grad, workspace, size, stride, pad, mode=PoolMode.max):
    result = _pool.poolNdBackward(grad.jax, indata.jax, _t(size), _t(stride), _t(pad), mode.value)
    return GPUArray(result)


# -- batch norm --------------------------------------------------------------

def batchNormNd(data, scale, bias, mean, var, epsilon, factor, test, mode=BatchNormMode.spatial, out=None):
    if test:
        result = _norm.batchNormTest(data.jax, scale.jax, bias.jax, mean.jax, var.jax, epsilon, mode=mode.value)

        if out is None:
            return GPUArray(result)

        out._write(result)
        return out

    outdata, savemean, saveinvvar, newMean, newVar = _norm.batchNormTrain(
        data.jax, scale.jax, bias.jax, mean.jax, var.jax, epsilon, factor, mode=mode.value
    )

    mean._write(newMean)
    var._write(newVar)

    shape = scale.shape
    return GPUArray(outdata), GPUArray(savemean.reshape(shape)), GPUArray(saveinvvar.reshape(shape))


def batchNormNdBackward(data, grad, scale, savemean, saveinvvar, epsilon, mode=BatchNormMode.spatial):
    ingrad, scalegrad, bgrad = _norm.batchNormBackward(
        grad.jax, data.jax, scale.jax, savemean.jax, saveinvvar.jax, epsilon, mode=mode.value
    )

    shape = scale.shape
    return GPUArray(ingrad), GPUArray(scalegrad.reshape(shape)), GPUArray(bgrad.reshape(shape))


# -- softmax -----------------------------------------------------------------

def softmaxNd(data, mode=SoftMaxMode.spatial):
    return GPUArray(_softmax.softmaxNd(data.jax))


def softmaxNdBackward(outdata, grad):
    return GPUArray(_softmax.softmaxNdBackward(outdata.jax, grad.jax))


# -- LRN ---------------------------------------------------------------------

def mapLRN(data, means, N, alpha, beta, K, test=False):
    if means is None:
        return GPUArray(_norm.mapLRN(data.jax, int(N), alpha, beta, K)), None

    return GPUArray(_norm.divNorm(data.jax, means.jax, int(N), alpha, beta, K)), None


def mapLRNBackward(data, outdata, grad, means, workspace, N, alpha, beta, K):
    if means is None:
        return GPUArray(_norm.mapLRNBackward(data.jax, grad.jax, int(N), alpha, beta, K))

    dx, dmeans = _norm.divNormBackward(data.jax, means.jax, grad.jax, int(N), alpha, beta, K)
    return GPUArray(dx), GPUArray(dmeans)


def crossMapLRN(data, N, alpha, beta, K, test=False):
    return GPUArray(_norm.crossMapLRN(data.jax, int(N), alpha, beta, K)), None


def crossMapLRNBackward(data, outdata, grad, workspace, N, alpha, beta, K):
    return GPUArray(_norm.crossMapLRNBackward(data.jax, grad.jax, int(N), alpha, beta, K))


# -- instance norm -----------------------------------------------------------

def instanceNorm2d(data, scale, bias, epsilon=1e-5):
    outdata, savemean, saveinvvar, extscale = _norm.instanceNorm2d(data.jax, scale.jax, bias.jax, epsilon)
    return GPUArray(outdata), GPUArray(savemean), GPUArray(saveinvvar), GPUArray(extscale)


def instanceNorm2dBackward(grad, data, extscale, savemean, saveinvvar, epsilon, affine=True):
    result = _norm.instanceNorm2dBackward(
        grad.jax, data.jax, extscale.jax, savemean.jax, saveinvvar.jax, epsilon, affine=affine
    )

    if affine:
        ingrad, scalegrad, bgrad = result
        return GPUArray(ingrad), GPUArray(scalegrad), GPUArray(bgrad)

    return GPUArray(result)


# -- spatial transformer / RNN bind late (see ops.spatialtf / ops.rnn) -------

def spatialTf(data, transform, outshape, getGrid):
    from puzzlelib_tpu.ops import spatialtf as _stf
    outdata, grid = _stf.spatialTf(data.jax, transform.jax, outshape)

    if not getGrid:
        return GPUArray(outdata)

    return GPUArray(outdata), GPUArray(grid)


def spatialTfBackward(grad, data, grid):
    from puzzlelib_tpu.ops import spatialtf as _stf
    ingrad, dtheta = _stf.spatialTfBackward(grad.jax, data.jax, grid.jax)
    return GPUArray(ingrad), GPUArray(dtheta)


def deviceSupportsBatchHint():
    return False


# RNN surface is provided by puzzlelib_tpu.backend.rnn (imported lazily to keep
# the base namespace import-light)

def createRnn(insize, hsize, layers, mode, direction, dropout=0.0, seed=0, batchsize=None):
    from puzzlelib_tpu.backend import rnn as _rnn

    rnn, W, params = _rnn.createRnn(insize, hsize, layers, mode, direction, dropout, seed, batchsize)
    return rnn, W, {i: layer for i, layer in enumerate(params)}


def acquireRnnParams(descRnn, w):
    from puzzlelib_tpu.backend import rnn as _rnn

    params = _rnn.acquireRnnParams(descRnn, w)
    return w, {i: layer for i, layer in enumerate(params)}


def updateRnnParams(descRnn, w, params):
    from puzzlelib_tpu.backend import rnn as _rnn
    return _rnn.updateRnnParams(descRnn, w, params)


def forwardRnn(data, W, descRnn, test=False):
    return descRnn.forward(data, W, test=test)


def backwardDataRnn(grad, outdata, W, reserve, descRnn):
    ingrad = descRnn.backwardData(grad, outdata, W, reserve)
    return ingrad, reserve


def backwardParamsRnn(data, outdata, W, reserve, descRnn):
    return descRnn.backwardParams(data, outdata, reserve)


class RNNMode(Enum):
    relu = "relu"
    tanh = "tanh"
    lstm = "lstm"
    gru = "gru"


class DirectionMode(Enum):
    uni = "uni"
    bi = "bi"
