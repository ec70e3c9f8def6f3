"""Reference: /root/reference/Modules/Transpose.py."""

from puzzlelib_tpu.backend import memory as Memory
from puzzlelib_tpu.modules.module import ModuleError, Module


class Transpose(Module):
    def __init__(self, axes=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.axes = axes

        if axes is None:
            self.invaxes = None
        else:
            self.invaxes = [0] * len(axes)
            for i, axis in enumerate(axes):
                self.invaxes[axis] = i

    def updateData(self, data):
        self.data = Memory.transpose(data, self.axes)

    def updateGrad(self, grad):
        self.grad = Memory.transpose(grad, self.invaxes)

    def checkDataShape(self, shape):
        if self.axes is not None and len(shape) != len(self.axes):
            raise ModuleError("Data dimension needs to be %d, (data has %d)" % (len(self.axes), len(shape)))

    def checkGradShape(self, shape):
        if self.axes is not None and len(shape) != len(self.axes):
            raise ModuleError("Grad dimension needs to be %d, (grad has %d)" % (len(self.axes), len(shape)))

    def dataShapeFrom(self, shape):
        return tuple(shape[axis] for axis in self.axes)

    def gradShapeFrom(self, shape):
        return tuple(shape[axis] for axis in self.invaxes)

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
