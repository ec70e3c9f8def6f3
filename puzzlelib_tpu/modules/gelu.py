"""Reference: /root/reference/Modules/Gelu.py."""

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import geluKer, geluDerKer
from puzzlelib_tpu.modules.module import Module


class Gelu(Module):
    def __init__(self, inplace=False, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.inplace = inplace

        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

    def updateData(self, data):
        self.data = data if self.inplace else gpuarray.empty(data.shape, dtype=data.dtype, allocator=memPool)
        geluKer(data.dtype)(self.data, data)

    def updateGrad(self, grad):
        self.grad = grad if self.inplace else gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
        geluDerKer(grad.dtype)(self.grad, grad, self.inData)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
