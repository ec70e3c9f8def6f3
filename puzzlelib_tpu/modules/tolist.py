"""Reference: /root/reference/Modules/ToList.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.modules.module import ModuleError, Module


class ToList(Module):
    def __init__(self, name=None):
        super().__init__(name)
        self.movesData = True
        self.movesGrad = True

    def updateData(self, data):
        self.data = []
        self.extendDataList(self.data, data)

    def extendDataList(self, lst, data):
        if isinstance(data, gpuarray.GPUArray):
            lst.append(data)
        else:
            for dat in data:
                self.extendDataList(lst, dat)

    def updateGrad(self, grad):
        self.grad, _ = self.buildGradList(grad, self.inData, 0)

    def buildGradList(self, grad, data, i):
        if isinstance(data, gpuarray.GPUArray):
            return grad[i], i + 1

        lst = []
        for dat in data:
            inlst, i = self.buildGradList(grad, dat, i)
            lst.append(inlst)

        return lst, i

    def dataShapeFrom(self, shapes):
        lst = []
        self.extendDataShapeList(lst, shapes)
        return lst

    def extendDataShapeList(self, lst, shapes):
        if isinstance(shapes, tuple):
            lst.append(shapes)
        else:
            for shape in shapes:
                self.extendDataShapeList(lst, shape)

    def gradShapeFrom(self, shapes):
        inshapes, _ = self.buildGradShapeList(shapes, self.inData, 0)
        return inshapes

    def buildGradShapeList(self, shapes, data, i):
        if isinstance(data, gpuarray.GPUArray):
            return shapes[i], i + 1

        lst = []
        for dat in data:
            inlst, i = self.buildGradShapeList(shapes, dat, i)
            lst.append(inlst)

        return lst, i

    def checkGradShape(self, shapes):
        self.checkGradList(shapes, self.inData, 0)

    def checkGradList(self, shapes, data, i):
        if isinstance(data, gpuarray.GPUArray):
            if data.shape != shapes[i]:
                raise ModuleError("Inconsistency in data and corresponding grad shapes at index %s "
                                  "(expected %s, given %s)" % (i, data.shape, shapes[i]))
            return i + 1

        for dat in data:
            i = self.checkGradList(shapes, dat, i)

        return i
