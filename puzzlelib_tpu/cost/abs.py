"""L1 cost (reference: /root/reference/Cost/Abs.py)."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import l1gradKer

from puzzlelib_tpu.cost.cost import Cost


class Abs(Cost):
    def calcGrad(self, pred, target):
        grad = gpuarray.empty(pred.shape, dtype=np.float32, allocator=memPool)
        norm = 1.0 / np.prod(target.shape)

        l1gradKer(grad, pred, target, norm)
        return grad

    def calcError(self, pred, target):
        diff = Blas.addVectorToVector(pred.ravel(), target.ravel(), alpha=1.0, beta=-1.0)
        self.devErr._write(Blas.vectorL1Norm(diff).jax / np.prod(pred.shape[1:]))
        self.accumErr += self.devErr

    def calcVal(self, pred, target):
        diff = Blas.addVectorToVector(pred.ravel(), target.ravel(), alpha=1.0, beta=-1.0)
        return Blas.vectorL1Norm(diff).get() / np.prod(target.shape)

    def checkDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]

    def checkValDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]
