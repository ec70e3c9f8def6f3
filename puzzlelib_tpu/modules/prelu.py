"""Parametric ReLU.

API parity target: /root/reference/Modules/PRelu.py — per-map (or shared)
learnable negative slopes, initialized to 0.25.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.kernels.prelu import prelu, preluBackwardData, preluBackwardParams

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module

INIT_SLOPE = 0.25


class PRelu(Module):
    def __init__(self, maps, inplace=False, sharedMaps=False, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.sharedMaps, self.inplace = sharedMaps, inplace

        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

        nSlopes = 1 if sharedMaps else maps
        self.slopes = None
        self.setVar("slopes", Variable(gpuarray.to_gpu(np.full((nSlopes, ), INIT_SLOPE, dtype=np.float32))))

    def _forbidInplaceBackward(self):
        if self.inplace:
            raise ModuleError("%s: using inplace flag while calculating gradient is prohibited" % self)

    def updateData(self, data):
        self.data = prelu(data, self.slopes, self.inplace, self.sharedMaps)

    def updateGrad(self, grad):
        self._forbidInplaceBackward()
        self.grad = preluBackwardData(grad, self.slopes, self.inData, self.sharedMaps)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        self._forbidInplaceBackward()

        acc = self.vars["slopes"].grad
        slopegrad = preluBackwardParams(self.inData, grad, self.sharedMaps)
        Blas.addVectorToVector(slopegrad, acc, out=acc, alpha=scale, beta=momentum)

    def dataShapeFrom(self, shape):
        return shape

    gradShapeFrom = dataShapeFrom

    def checkDataShape(self, shape):
        if len(shape) < 2:
            raise ModuleError("Data tensor dimension must be at least 2")

        nSlopes = self.slopes.shape[0]
        if not self.sharedMaps and shape[1] != nSlopes:
            raise ModuleError("Data tensor has %s maps (expected %s)" % (shape[1], nSlopes))

    def checkGradShape(self, shape):
        if shape != self.inData.shape:
            raise ModuleError("Grad tensor has shape %s (expected %s)" % (shape, self.inData.shape))
