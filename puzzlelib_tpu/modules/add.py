"""Reference: /root/reference/Modules/Add.py."""

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.modules.module import ModuleError, Module


class Add(Module):
    def __init__(self, name=None):
        super().__init__(name)
        self.movesGrad = True

    def updateData(self, data):
        firstdata = data[0]
        self.data = gpuarray.zeros(firstdata.shape, dtype=firstdata.dtype, allocator=memPool)

        for dat in data:
            Blas.toVectorAddVector(self.data.ravel(), dat.ravel())

    def updateGrad(self, grad):
        self.grad = [grad] * len(self.inData)

    def checkDataShape(self, shapes):
        for shape in shapes:
            if shape != shapes[0]:
                raise ModuleError("Shape %s is not equal to initial shape %s" % (shape, shapes[0]))

    def dataShapeFrom(self, shape):
        return shape[0]

    def gradShapeFrom(self, shape):
        return [shape] * len(self.inData)

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
