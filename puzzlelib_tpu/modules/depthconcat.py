"""Reference: /root/reference/Modules/DepthConcat.py."""

from puzzlelib_tpu.backend import memory as Memory
from puzzlelib_tpu.modules.module import ModuleError, Module


class DepthConcat(Module):
    def __init__(self, name=None):
        super().__init__(name)
        self.movesData = True

    def updateData(self, data):
        self.data = Memory.depthConcat(data)

    def updateGrad(self, grad):
        self.grad = Memory.depthSplit(grad, self.inData)

    def checkDataShape(self, shapes):
        if not isinstance(shapes, list):
            raise ModuleError("Data must be list of tensors")

        for shape in shapes:
            if len(shape) != 4:
                raise ModuleError("Data must consist of 4d tensors")

            if shape[0] != shapes[0][0]:
                raise ModuleError("Inconsistency in batch size")

    def dataShapeFrom(self, shapes):
        depth, h, w = 0, 0, 0
        for shape in shapes:
            depth += shape[1]
            h, w = max(h, shape[2]), max(w, shape[3])

        return shapes[0][0], depth, h, w

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")

        depth, h, w = 0, 0, 0
        for data in self.inData:
            sh = data.shape
            depth += sh[1]
            h, w = max(h, sh[2]), max(w, sh[3])

        gradshape = (self.inData[0].shape[0], depth, h, w)
        if shape != gradshape:
            raise ModuleError("Bad grad shape (%s given, %s expected)" % (shape, gradshape))

    def gradShapeFrom(self, shape):
        return [data.shape for data in self.inData]
