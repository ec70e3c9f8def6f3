"""Affine constant transform ``a * x + b``.

Parity surface: /root/reference/Modules/MulAddConst.py. The forward and the
(constant-slope) backward are single fused elementwise XLA ops.
"""

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.ops import elementwise as ew
from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.modules.module import Module


class MulAddConst(Module):
    def __init__(self, a=1.0, b=0.0, inplace=False, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.a, self.b = a, b

        self.inplace = inplace
        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

    def _emit(self, src, value):
        if self.inplace:
            src._write(value)
            return src
        return GPUArray(value)

    def updateData(self, data):
        self.data = self._emit(data, ew.linear(data.jax, self.a, self.b))

    def updateGrad(self, grad):
        self.grad = self._emit(grad, ew.linear(grad.jax, self.a, 0.0))

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
