"""2D spatial padding, constant or reflect.

Parity surface: /root/reference/Modules/Pad2D.py (pad order up/bottom/left/
right, fill value, reflect mode). Constant padding is a single fused
``jnp.pad``; reflect rides ``ops.pad``; both backwards are slices.
"""

from enum import Enum

import jax.numpy as jnp

from puzzlelib_tpu.backend.kernels import pad as Pad
from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.modules.module import ModuleError, Module


class PadMode(str, Enum):
    constant = "constant"
    reflect = "reflect"


class Pad2D(Module):
    def __init__(self, pad, mode="constant", fillValue=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.mode = PadMode(mode)
        self.pad = self.repeat(pad, 4)
        self.fillValue = 0 if fillValue is None else fillValue

    def updateData(self, data):
        up, bottom, left, right = self.pad

        if self.mode == PadMode.reflect:
            self.data = Pad.reflectpad2d(data, self.pad)
            return

        padded = jnp.pad(data.jax.astype(jnp.float32),
                         ((0, 0), (0, 0), (up, bottom), (left, right)),
                         constant_values=self.fillValue)
        self.data = GPUArray(padded)

    def updateGrad(self, grad):
        up, bottom, left, right = self.pad

        if self.mode == PadMode.reflect:
            self.grad = Pad.reflectpad2dBackward(grad, self.pad)
            return

        h, w = grad.shape[2:]
        self.grad = GPUArray(grad.jax[:, :, up:h - bottom, left:w - right])

    def dataShapeFrom(self, shape):
        n, c, h, w = shape
        up, bottom, left, right = self.pad
        return n, c, h + up + bottom, w + left + right

    def gradShapeFrom(self, shape):
        n, c, h, w = shape
        up, bottom, left, right = self.pad
        return n, c, h - up - bottom, w - left - right

    def checkDataShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Data must be 4d tensor")

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")

        up, bottom, left, right = self.pad
        h, w = shape[2:]

        if h < up + bottom + 1:
            raise ModuleError("Grad maps height is too small (got %d, expected >= %d)" % (h, up + bottom + 1))

        if w < left + right + 1:
            raise ModuleError("Grad maps width is too small (got %d, expected >= %d)" % (w, left + right + 1))

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
