"""Instance normalization over the spatial dims of 4d maps.

Parity surface: /root/reference/Modules/InstanceNorm2D.py (ctor args, affine
switch, saved-stat reset discipline). The compute rides ``ops.norm``: forward
is batch norm over an (1, N*C, H, W) view with tiled affine params, backward
folds the per-sample scale/bias grads back to (C,) — all fused XLA programs.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.ops import norm as normOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class InstanceNorm2D(Module):
    def __init__(self, numOfMaps, epsilon=1e-5, affine=True, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.numOfMaps = numOfMaps
        self.epsilon = epsilon
        self.affine = affine

        self.scale = self.bias = None
        affineShape = (1, numOfMaps, 1, 1)
        self.setVar("scale", Variable(gpuarray.to_gpu(np.ones(affineShape, dtype=np.float32))))
        self.setVar("bias", Variable(gpuarray.zeros(affineShape, dtype=np.float32)))

        self._saved = None       # (mean, invvar, tiled scale) from the last forward
        self._paramGrads = None  # (dscale, dbias) from the last backward

    def updateData(self, data):
        out, mean, invvar, extscale = normOps.instanceNorm2d(
            data.jax, self.scale.jax, self.bias.jax, self.epsilon)

        self.data = GPUArray(out)
        self._saved = (mean, invvar, extscale)

    def updateGrad(self, grad):
        mean, invvar, extscale = self._saved
        result = normOps.instanceNorm2dBackward(
            grad.jax, self.inData.jax, extscale, mean, invvar, self.epsilon, self.affine)

        if self.affine:
            dx, dscale, dbias = result
            self._paramGrads = (dscale, dbias)
        else:
            dx = result

        self.grad = GPUArray(dx)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        if self.affine:
            dscale, dbias = self._paramGrads
            self.foldParamGrad("scale", dscale, scale, momentum)
            self.foldParamGrad("bias", dbias, scale, momentum)

    def reset(self):
        super().reset()
        self._saved = self._paramGrads = None

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def checkDataShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Data must be 4d tensor")

    def checkGradShape(self, shape):
        if shape != self.data.shape:
            raise ModuleError("Inconsistency in grad shape - expected %s (%s given)" % (self.data.shape, shape))

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
