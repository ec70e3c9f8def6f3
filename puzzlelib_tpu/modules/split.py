"""Reference: /root/reference/Modules/Split.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.modules.module import ModuleError, Module


class Split(Module):
    def __init__(self, axis, sections, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.sections = sections
        self.axis = axis

    def updateData(self, data):
        self.data = gpuarray.split(data, self.sections, self.axis)

    def updateGrad(self, grad):
        self.grad = gpuarray.concatenate(grad, self.axis)

    def dataShapeFrom(self, shape):
        return [shape[:self.axis] + (sec, ) + shape[self.axis + 1:] for sec in self.sections]

    def gradShapeFrom(self, shapes):
        concatDim = sum(shape[self.axis] for shape in shapes)
        return shapes[0][:self.axis] + (concatDim, ) + shapes[0][self.axis + 1:]

    def checkDataShape(self, shape):
        if len(shape) < self.axis:
            raise ModuleError("Not enough dims in data (%d were given, need at least %d)" % (len(shape), self.axis))

        concatDim = sum(self.sections)
        if concatDim != shape[self.axis]:
            raise ModuleError(
                "Data shape %s is inconsistent with given sections %s "
                "(expected size %d on axis %d, %d was given)" %
                (shape, self.sections, concatDim, self.axis, shape[self.axis])
            )

    def checkGradShape(self, shapes):
        for i, shape in enumerate(shapes):
            if shape != self.data[i].shape:
                raise ModuleError(
                    "Expected grad shape %s on %d place (%s was given)" % (self.data[i].shape, i + 1, shape)
                )

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
