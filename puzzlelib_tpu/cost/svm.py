"""One-vs-rest SVM cost, L1/L2 margins (reference: /root/reference/Cost/SVM.py)."""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.costs import getAccuracyKernel, svmKernel
from puzzlelib_tpu.backend.kernels.matvec import argmax, argmaxBatch

from puzzlelib_tpu.cost.cost import CostError, Cost


class SVM(Cost):
    def __init__(self, mode="l1"):
        super().__init__()

        self.mode = mode
        self.mostProb = None

    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        self.devErr, grad = svmKernel(scores, labels, mode=self.mode, error=self.devErr)
        return grad

    def calcError(self, scores, labels):
        self.accumErr += self.devErr

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        if scores.ndim == 2:
            shape = scores.shape
            self.mostProb = argmax(scores, axis=1)
        else:
            shape = scores.shape[:1] + scores.shape[2:]
            scores = scores.reshape(*scores.shape[:2], int(np.prod(scores.shape[2:])))
            self.mostProb = argmaxBatch(scores, axis=1).reshape(shape)

        calcAccuracy = getAccuracyKernel("calcAccuracy")
        return calcAccuracy(self.mostProb, labels, allocator=memPool).get() / shape[0]

    def reset(self):
        super().reset()
        self.mostProb = None

    def checkDataShape(self, scores, labels):
        assert scores.ndim > 1 and labels.ndim == scores.ndim - 1
        assert labels.dtype == np.int32

        if scores.ndim > 2:
            assert scores.shape[2:] == labels.shape[1:]

    def checkValDataShape(self, scores, labels):
        self.checkDataShape(scores, labels)

    @staticmethod
    def verifyLabels(scores, labels):
        mn, mx = gpuarray.minimum(labels).get(), gpuarray.maximum(labels).get()

        if mn < 0:
            raise CostError("SVM labels verification failed, found index %s (< 0)" % mn)

        if mx >= scores.shape[1]:
            raise CostError("SVM labels verification failed, found index %s (> %s)" % (mx, scores.shape[1] - 1))
