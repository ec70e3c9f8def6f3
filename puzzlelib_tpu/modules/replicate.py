"""Reference: /root/reference/Modules/Replicate.py."""

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.modules.module import Module


class Replicate(Module):
    def __init__(self, times, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.movesData = True
        self.times = times

    def updateData(self, data):
        self.data = [data] * self.times

    def updateGrad(self, grad):
        firstgrad = grad[0]
        self.grad = gpuarray.zeros(firstgrad.shape, dtype=firstgrad.dtype, allocator=memPool)

        for gr in grad:
            Blas.toVectorAddVector(self.grad.ravel(), gr.ravel())

    def dataShapeFrom(self, shape):
        return [shape] * self.times

    def gradShapeFrom(self, shape):
        return shape[0]

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
