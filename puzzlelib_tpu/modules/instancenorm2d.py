"""Reference: /root/reference/Modules/InstanceNorm2D.py."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.dnn import instanceNorm2d, instanceNorm2dBackward

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class InstanceNorm2D(Module):
    def __init__(self, numOfMaps, epsilon=1e-5, affine=True, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.numOfMaps = numOfMaps
        self.epsilon = epsilon
        self.affine = affine

        shape = (1, numOfMaps, 1, 1)

        self.scale = None
        self.bias = None

        self.setVar("scale", Variable(gpuarray.to_gpu(np.ones(shape, dtype=np.float32))))
        self.setVar("bias", Variable(gpuarray.zeros(shape, dtype=np.float32)))

        self.savemean, self.saveinvvar, self.extscale = None, None, None
        self.scalegrad, self.biasgrad = None, None

    def updateData(self, data):
        self.data, self.savemean, self.saveinvvar, self.extscale = instanceNorm2d(
            data, self.scale, self.bias, self.epsilon
        )

    def updateGrad(self, grad):
        if self.affine:
            self.grad, self.scalegrad, self.biasgrad = instanceNorm2dBackward(
                grad, self.inData, self.extscale, self.savemean, self.saveinvvar, self.epsilon, True
            )
        else:
            self.grad = instanceNorm2dBackward(
                grad, self.inData, self.extscale, self.savemean, self.saveinvvar, self.epsilon, False
            )

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        if self.affine:
            Blas.addVectorToVector(
                self.scalegrad.ravel(), self.vars["scale"].grad.ravel(),
                out=self.vars["scale"].grad.ravel(), alpha=scale, beta=momentum
            )
            Blas.addVectorToVector(
                self.biasgrad.ravel(), self.vars["bias"].grad.ravel(),
                out=self.vars["bias"].grad.ravel(), alpha=scale, beta=momentum
            )

    def checkDataShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Data must be 4d tensor")

    def checkGradShape(self, shape):
        if shape != self.data.shape:
            raise ModuleError("Inconsistency in grad shape - expected %s (%s given)" % (self.data.shape, shape))

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def reset(self):
        super().reset()

        self.savemean, self.saveinvvar, self.extscale = None, None, None
        if self.affine:
            self.scalegrad, self.biasgrad = None, None

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
