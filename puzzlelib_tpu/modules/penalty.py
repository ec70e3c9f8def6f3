"""Regularization penalty pass-through.

API parity target: /root/reference/Modules/Penalty.py — forward is identity;
backward folds an L1 (sign) or L2 (value) penalty on the activations into the
incoming gradient, normalized by batch size.
"""

from enum import Enum

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import l1penaltyKer
from puzzlelib_tpu.modules.module import Module


class PenaltyMode(str, Enum):
    l1 = "l1"
    l2 = "l2"


class Penalty(Module):
    def __init__(self, mode="l1", weight=1e-2, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.gradUsesOutData = True
        self.movesData = True

        self.mode = PenaltyMode(mode)
        self.weight = weight

    def updateData(self, data):
        self.data = data

    def _l1Grad(self, grad, strength):
        out = gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
        l1penaltyKer(out, grad, self.data, strength)
        return out

    def _l2Grad(self, grad, strength):
        penalized = Blas.addVectorToVector(grad.ravel(), self.data.ravel(), alpha=1.0, beta=-strength)
        return penalized.reshape(grad.shape)

    def updateGrad(self, grad):
        strength = self.weight / grad.shape[0]
        kernel = {PenaltyMode.l1: self._l1Grad, PenaltyMode.l2: self._l2Grad}[self.mode]

        self.grad = kernel(grad, strength)

    def dataShapeFrom(self, shape):
        return shape

    gradShapeFrom = dataShapeFrom
