"""Reference: /root/reference/Modules/MoveAxis.py."""

from puzzlelib_tpu.backend import memory as Memory
from puzzlelib_tpu.modules.module import ModuleError, Module


class MoveAxis(Module):
    def __init__(self, src, dst, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        if src == dst:
            raise ModuleError("Trivial axis move is treated as error")

        self.src, self.dst = src, dst

    def updateData(self, data):
        self.data = Memory.moveaxis(data, self.src, self.dst)

    def updateGrad(self, grad):
        self.grad = Memory.moveaxis(grad, self.dst, self.src)

    def checkDataShape(self, shape):
        ln = max(self.src, self.dst)
        if len(shape) - 1 < ln:
            raise ModuleError("Data dimension needs to be at least %d, (data has %d)" % (ln + 1, len(shape)))

    def checkGradShape(self, shape):
        ln = max(self.src, self.dst)
        if len(shape) - 1 < ln:
            raise ModuleError("Grad dimension needs to be at least %d, (grad has %d)" % (ln + 1, len(shape)))

    def dataShapeFrom(self, shape):
        if self.src < self.dst:
            return shape[:self.src] + shape[self.src + 1:self.dst + 1] + (shape[self.src], ) + shape[self.dst + 1:]
        else:
            return shape[:self.dst] + (shape[self.src], ) + shape[self.dst:self.src] + shape[self.src + 1:]

    def gradShapeFrom(self, shape):
        if self.src < self.dst:
            return shape[:self.src] + (shape[self.dst], ) + shape[self.src:self.dst] + shape[self.dst + 1:]
        else:
            return shape[:self.dst] + shape[self.dst + 1:self.src + 1] + (shape[self.dst], ) + shape[self.src + 1:]

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
