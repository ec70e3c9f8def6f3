"""Hinge cost (reference: /root/reference/Cost/Hinge.py)."""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.costs import hingeKer

from puzzlelib_tpu.cost.cost import CostError, Cost


class Hinge(Cost):
    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        grad = gpuarray.empty(scores.shape, dtype=np.float32, allocator=memPool)
        self.devErr.fill(0.0)

        hingeKer(scores, labels, self.devErr, grad, scores.shape[0], scores.shape[1])
        return grad

    def calcError(self, scores, labels):
        self.accumErr += self.devErr

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        diff = gpuarray.empty(scores.shape, dtype=np.float32, allocator=memPool)
        devErr = gpuarray.zeros((), dtype=np.float32, allocator=memPool)

        hingeKer(scores, labels, devErr, diff, scores.shape[0], scores.shape[1])
        return devErr.get() / scores.shape[0]

    def checkDataShape(self, scores, labels):
        assert scores.ndim == 2 and scores.shape == labels.shape
        assert labels.dtype == np.int32

    def checkValDataShape(self, scores, labels):
        assert scores.ndim == 2 and scores.shape == labels.shape
        assert labels.dtype == np.int32

    @staticmethod
    def verifyLabels(labels):
        mn, mx = gpuarray.minimum(labels).get(), gpuarray.maximum(labels).get()

        if mn < -1:
            raise CostError("Hinge labels verification failed, found index %s (< -1)" % mn)

        if mx > 1:
            raise CostError("Hinge labels verification failed, found index %s (> 1)" % mx)
