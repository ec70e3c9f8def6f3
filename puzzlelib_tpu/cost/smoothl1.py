"""Smooth-L1 (Huber) cost (reference: /root/reference/Cost/SmoothL1.py)."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.costs import smoothL1Ker

from puzzlelib_tpu.cost.cost import Cost


class SmoothL1(Cost):
    def calcGrad(self, pred, target):
        grad = gpuarray.empty(pred.shape, dtype=np.float32, allocator=memPool)

        fullnorm = 1.0 / np.prod(target.shape)
        norm = 1.0 / np.prod(target.shape[1:])

        self.devErr.fill(0.0)
        smoothL1Ker(pred, target, self.devErr, grad, norm, fullnorm)

        return grad

    def calcError(self, pred, target):
        self.accumErr += self.devErr

    def calcVal(self, pred, target):
        diff = gpuarray.empty(pred.shape, dtype=np.float32, allocator=memPool)

        fullnorm = 1.0 / np.prod(target.shape)
        devErr = gpuarray.zeros((), dtype=np.float32, allocator=memPool)

        smoothL1Ker(pred, target, devErr, diff, fullnorm, fullnorm)
        return devErr.get()

    def checkDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]

    def checkValDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]
