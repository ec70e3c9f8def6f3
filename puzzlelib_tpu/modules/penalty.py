"""Reference: /root/reference/Modules/Penalty.py."""

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

    def updateGrad(self, grad):
        if self.mode == PenaltyMode.l1:
            self.grad = gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
            l1penaltyKer(self.grad, grad, self.data, self.weight / grad.shape[0])

        elif self.mode == PenaltyMode.l2:
            self.grad = Blas.addVectorToVector(
                grad.ravel(), self.data.ravel(), alpha=1.0, beta=-self.weight / grad.shape[0]
            ).reshape(grad.shape)

        else:
            raise NotImplementedError(self.mode)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape
