"""Binary cross-entropy cost (reference: /root/reference/Cost/BCE.py)."""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.costs import getAccuracyKernel, bceKer

from puzzlelib_tpu.cost.cost import CostError, Cost


class BCE(Cost):
    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        grad = gpuarray.empty(scores.shape, dtype=np.float32, allocator=memPool)
        self.devErr.fill(0.0)

        bceKer(scores, labels, self.devErr, grad, scores.shape[0], np.prod(scores.shape[1:]))
        return grad

    def calcError(self, scores, labels):
        self.accumErr += self.devErr

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        calcBCEAccuracy = getAccuracyKernel("calcBCEAccuracy")
        return calcBCEAccuracy(scores, labels, allocator=memPool).get() / np.prod(scores.shape)

    def checkDataShape(self, scores, labels):
        self.checkShapeCompatibility(scores, labels)

    def checkValDataShape(self, scores, labels):
        self.checkShapeCompatibility(scores, labels)

    @staticmethod
    def checkShapeCompatibility(scores, labels):
        assert labels.dtype == np.int32

        if scores.ndim == 2 and scores.shape[1] == 1:
            assert labels.ndim == 1
        else:
            assert np.prod(scores.shape[1:]) == np.prod(labels.shape[1:])

    @staticmethod
    def verifyLabels(labels):
        mn, mx = gpuarray.minimum(labels).get(), gpuarray.maximum(labels).get()

        if mn < 0:
            raise CostError("BCE labels verification failed, found index %s (< 0)" % mn)

        if mx > 1:
            raise CostError("BCE labels verification failed, found index %s (> 1)" % mx)
