"""Reference: /root/reference/Modules/Tile.py."""

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.modules.module import ModuleError, Module


class Tile(Module):
    def __init__(self, axis, times, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.axis = axis
        self.times = times

    def updateData(self, data):
        self.data = gpuarray.tile(data, self.times, axis=self.axis)

    def updateGrad(self, grad):
        sections = [grad.shape[self.axis] // self.times] * self.times
        ingrad = gpuarray.split(grad, sections, axis=self.axis)

        for i in range(1, len(ingrad)):
            Blas.toVectorAddVector(ingrad[0].ravel(), ingrad[i].ravel())

        self.grad = ingrad[0]

    def checkDataShape(self, shape):
        if len(shape) < self.axis + 1:
            raise ModuleError("Not enough dimensions in data shape (%s given, %s required)" %
                              (len(shape), self.axis + 1))

    def dataShapeFrom(self, shape):
        return shape[:self.axis] + (shape[self.axis] * self.times, ) + shape[self.axis + 1:]

    def checkGradShape(self, shape):
        if len(shape) < self.axis + 1:
            raise ModuleError("Not enough dimensions in grad shape (%s given, %s required)" %
                              (len(shape), self.axis + 1))

        if shape[self.axis] % self.times != 0:
            raise ModuleError("Dimension %s in grad shape must be divisible by %s" % (shape[self.axis], self.times))

    def gradShapeFrom(self, shape):
        return shape[:self.axis] + (shape[self.axis] // self.times, ) + shape[self.axis + 1:]

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
