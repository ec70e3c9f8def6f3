"""Reference: /root/reference/Modules/MulAddConst.py."""

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import linearKer
from puzzlelib_tpu.modules.module import Module


class MulAddConst(Module):
    def __init__(self, a=1.0, b=0.0, inplace=False, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.a, self.b = a, b
        self.inplace = inplace

        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

    def updateData(self, data):
        self.data = data if self.inplace else gpuarray.empty(data.shape, dtype=data.dtype, allocator=memPool)
        linearKer(data.dtype)(self.data, data, self.a, self.b)

    def updateGrad(self, grad):
        self.grad = grad if self.inplace else gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
        linearKer(grad.dtype)(self.grad, grad, self.a, 0.0)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
