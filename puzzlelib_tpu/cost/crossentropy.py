"""Fused softmax + cross-entropy cost (reference: /root/reference/Cost/CrossEntropy.py)."""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.costs import getAccuracyKernel, crossEntropyKernel
from puzzlelib_tpu.backend.kernels.matvec import argmax, argmaxBatch

from puzzlelib_tpu.cost.cost import CostError, Cost


class CrossEntropy(Cost):
    def __init__(self, maxlabels=None, weights=None):
        super().__init__()

        self.maxlabels = maxlabels
        self.mostProb = None

        if isinstance(weights, np.ndarray):
            weights = gpuarray.to_gpu(weights)

        self.weights = weights

    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        self.devErr, grad = crossEntropyKernel(scores, labels, weights=self.weights, error=self.devErr)
        return grad

    def calcError(self, scores, labels):
        self.accumErr += self.devErr

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        if scores.ndim == 2:
            self.mostProb = argmax(scores, axis=1)
        else:
            scores = scores.reshape(*scores.shape[:2], int(np.prod(scores.shape[2:])))
            self.mostProb = argmaxBatch(scores, axis=1).reshape(labels.shape)

        calcAccuracy = getAccuracyKernel("calcAccuracy")
        error = calcAccuracy(self.mostProb, labels, allocator=memPool).get() / np.prod(labels.shape)

        return error

    def reset(self):
        super().reset()
        self.mostProb = None

    def checkDataShape(self, scores, labels):
        assert scores.ndim > 1 and labels.ndim == scores.ndim - 1
        assert labels.dtype == np.int32

        if scores.ndim > 2:
            assert scores.shape[2:] == labels.shape[1:]

        if self.maxlabels:
            assert scores.shape[1] == self.maxlabels

        if self.weights is not None:
            assert self.weights.shape[0] == scores.shape[1]

    def checkValDataShape(self, scores, labels):
        assert scores.ndim > 1 and labels.ndim == scores.ndim - 1
        assert labels.dtype == np.int32

        if scores.ndim > 2:
            assert scores.shape[2:] == labels.shape[1:]

        if self.maxlabels:
            assert scores.shape[1] == self.maxlabels

    @staticmethod
    def verifyLabels(scores, labels):
        mn, mx = gpuarray.minimum(labels).get(), gpuarray.maximum(labels).get()

        if mn < 0:
            raise CostError("Cross entropy labels verification failed, found index %s (< 0)" % mn)

        if mx >= scores.shape[1]:
            raise CostError("Cross entropy labels verification failed, found index %s (> %s)" %
                            (mx, scores.shape[1] - 1))
