"""Reference: /root/reference/Modules/PRelu.py."""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.kernels.prelu import prelu, preluBackwardData, preluBackwardParams

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class PRelu(Module):
    def __init__(self, maps, inplace=False, sharedMaps=False, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.sharedMaps = sharedMaps
        self.inplace = inplace

        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

        shape = (1, ) if sharedMaps else (maps, )
        slopes = gpuarray.to_gpu(np.full(shape, 0.25, dtype=np.float32))

        self.slopes = None
        self.setVar("slopes", Variable(slopes))

    def updateData(self, data):
        self.data = prelu(data, self.slopes, self.inplace, self.sharedMaps)

    def updateGrad(self, grad):
        if self.inplace:
            raise ModuleError("%s: using inplace flag while calculating gradient is prohibited" % self)

        self.grad = preluBackwardData(grad, self.slopes, self.inData, self.sharedMaps)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        if self.inplace:
            raise ModuleError("%s: using inplace flag while calculating gradient is prohibited" % self)

        slopegrad = preluBackwardParams(self.inData, grad, self.sharedMaps)
        Blas.addVectorToVector(
            slopegrad, self.vars["slopes"].grad, out=self.vars["slopes"].grad, alpha=scale, beta=momentum
        )

    def dataShapeFrom(self, shape):
        return shape

    def checkDataShape(self, shape):
        if len(shape) < 2:
            raise ModuleError("Data tensor dimension must be at least 2")

        if not self.sharedMaps and shape[1] != self.slopes.shape[0]:
            raise ModuleError("Data tensor has %s maps (expected %s)" % (shape[1], self.slopes.shape[0]))

    def gradShapeFrom(self, shape):
        return shape

    def checkGradShape(self, shape):
        if shape != self.inData.shape:
            raise ModuleError("Grad tensor has shape %s (expected %s)" % (shape, self.inData.shape))
