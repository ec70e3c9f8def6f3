"""KL divergence cost (reference: /root/reference/Cost/KLDivergence.py)."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.costs import getAccuracyKernel
from puzzlelib_tpu.backend.dnn import softmaxNd

from puzzlelib_tpu.cost.cost import Cost


class KLDivergence(Cost):
    def __init__(self, maxlabels=None, normTarget=False):
        super().__init__()

        self.maxlabels = maxlabels
        self.normTarget = normTarget

    def _softmaxed(self, pred, target):
        shape = pred.shape
        softmax = softmaxNd(pred.reshape(shape[0], int(np.prod(shape[1:])), 1, 1))

        if self.normTarget:
            tshape = target.shape
            target = softmaxNd(target.reshape(tshape[0], int(np.prod(tshape[1:])), 1, 1))

        return softmax, target

    def calcGrad(self, pred, target):
        softmax, target = self._softmaxed(pred, target)

        grad = gpuarray.empty(pred.shape, dtype=np.float32, allocator=memPool)
        gradnorm = 1.0 / softmax.shape[0]

        klDivergence = getAccuracyKernel("klDivergence")
        self.devErr = klDivergence(softmax, target, grad, gradnorm, allocator=memPool)

        return grad

    def calcError(self, pred, target):
        self.accumErr += self.devErr

    def calcVal(self, pred, target):
        shape = pred.shape
        softmax, target = self._softmaxed(pred, target)

        grad = gpuarray.empty(pred.shape, dtype=np.float32, allocator=memPool)
        gradnorm = 1.0 / softmax.shape[0]

        klDivergence = getAccuracyKernel("klDivergence")
        error = klDivergence(softmax, target, grad, gradnorm, allocator=memPool)

        return error.get() / shape[0]

    def checkDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]

        if self.maxlabels:
            assert pred.shape[1] == self.maxlabels

    def checkValDataShape(self, pred, target):
        self.checkDataShape(pred, target)
