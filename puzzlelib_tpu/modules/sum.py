"""Weighted/unweighted axis sum (reference: /root/reference/Modules/Sum.py)."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.modules.module import ModuleError, Module


class Sum(Module):
    def __init__(self, axis, useWeights=True, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.useWeights = useWeights
        self.axis = axis

        self.v = None
        self.axisSize = None

    def updateData(self, batch):
        data, self.v = batch if self.useWeights else (batch, None)

        preAxis, postAxis = int(np.prod(data.shape[:self.axis])), int(np.prod(data.shape[self.axis + 1:]))
        self.axisSize = data.shape[self.axis]

        indata = data.reshape(preAxis, self.axisSize, postAxis)

        if self.useWeights:
            self.data = Blas.mulTensorOnVecGroup(indata, self.v.reshape(preAxis, self.axisSize),
                                                 formatT="gbp", transpT=True)
        else:
            self.data = Blas.sumOnTensorGroup(indata, formatT="gbp", cols=True)

        self.data = self.data.reshape(*data.shape[:self.axis], *data.shape[self.axis + 1:])

    def updateGrad(self, grad):
        preAxis, postAxis = int(np.prod(grad.shape[:self.axis])), int(np.prod(grad.shape[self.axis:]))

        outgrad = grad.reshape(preAxis, 1, postAxis)

        wgrad = None
        if self.useWeights:
            v = self.v.reshape(preAxis, self.axisSize, 1)
            datagrad = Blas.mulTensorBatch(v, outgrad, formatA="gbp", formatB="gbp", formatOut="gbp")

            indata = self.inData[0].reshape(preAxis, self.axisSize, postAxis)
            wgrad = Blas.mulTensorOnVecGroup(indata, grad.reshape(preAxis, postAxis), formatT="gbp")
            wgrad = wgrad.reshape(self.v.shape)
        else:
            ones = gpuarray.zeros((1, self.axisSize, 1), dtype=np.float32)
            ones.fill(1.0)
            datagrad = Blas.mulTensorBatch(
                gpuarray.tile(ones, preAxis, axis=0), outgrad, formatA="gbp", formatB="gbp", formatOut="gbp"
            )

        datagrad = datagrad.reshape(*grad.shape[:self.axis], self.axisSize, *grad.shape[self.axis:])
        self.grad = [datagrad, wgrad] if self.useWeights else datagrad

    def dataShapeFrom(self, shapes):
        shape = shapes[0] if self.useWeights else shapes
        return shape[:self.axis] + shape[self.axis + 1:]

    def gradShapeFrom(self, shape):
        inshape = shape[:self.axis] + (self.axisSize, ) + shape[self.axis:]
        return [inshape, (self.axisSize, )] if self.useWeights else inshape

    def checkDataShape(self, shapes):
        if self.useWeights:
            shape, wshape = shapes

            if len(wshape) != self.axis + 1:
                raise ModuleError("Not enough dims in weights (%d were given, need at least %d)" %
                                  (len(wshape), self.axis + 1))

            if shape[:self.axis + 1] != wshape:
                raise ModuleError("Inconsistency in data and weights shapes (%s with %s)" % (shape, wshape))
        else:
            shape = shapes

        if self.axis > len(shape) - 1:
            raise ModuleError("Not enough dims in data (%d were given, need at least %d)" %
                              (len(shape), self.axis + 1))

    def checkGradShape(self, shape):
        if self.axis > len(shape):
            raise ModuleError("Not enough dims in grad (%d were given, need at least %d)" %
                              (len(shape), self.axis))

        if self.useWeights and shape[:self.axis] != self.v.shape[:self.axis]:
            raise ModuleError("Inconsistency in grad and weights shapes (%s with %s)" % (shape, self.v.shape))

    def reset(self):
        super().reset()
        self.v = None
        self.axisSize = None

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
