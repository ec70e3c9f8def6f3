"""Reference: /root/reference/Modules/Mul.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import copy, memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import mulKer
from puzzlelib_tpu.modules.module import ModuleError, Module


class Mul(Module):
    def updateData(self, data):
        self.data = gpuarray.empty(data[0].shape, dtype=data[0].dtype, allocator=memPool)
        self.data.fill(1.0)

        for dat in data:
            mulKer(dat.dtype)(self.data, dat, self.data)

    def updateGrad(self, grad):
        self.grad = []

        for i in range(len(self.inData)):
            ingrad = copy(None, grad)

            for k in range(len(self.inData)):
                if k != i:
                    mulKer(ingrad.dtype)(ingrad, self.inData[k], ingrad)

            self.grad.append(ingrad)

    def checkDataShape(self, shapes):
        for shape in shapes:
            if shape != shapes[0]:
                raise ModuleError("Shape %s is not equal to initial shape %s" % (shape, shapes[0]))

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return [shape] * len(self.inData)

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
