"""Reference: /root/reference/Modules/Upsample2D.py."""

from enum import Enum

from puzzlelib_tpu.backend.kernels import upsample as Upsample
from puzzlelib_tpu.modules.module import ModuleError, Module


class UpsampleMode(str, Enum):
    nearest = "nearest"
    linear = "linear"


class Upsample2D(Module):
    def __init__(self, scale=2, mode="nearest", name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.scale = scale
        self.mode = UpsampleMode(mode)

    def updateData(self, data):
        self.data = Upsample.upsample2d(data, self.scale, mode=self.mode.value)

    def updateGrad(self, grad):
        self.grad = Upsample.upsample2dBackward(grad, self.scale, mode=self.mode.value)

    def checkDataShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Data must be 4d tensor")

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")

        _, _, h, w = shape
        if h % self.scale != 0 or w % self.scale != 0:
            raise ModuleError("Grad map size is not divisible by scale %s" % self.scale)

    def dataShapeFrom(self, shape):
        batchsize, maps, h, w = shape
        return batchsize, maps, self.scale * h, self.scale * w

    def gradShapeFrom(self, shape):
        batchsize, maps, h, w = shape
        return batchsize, maps, h // self.scale, w // self.scale
