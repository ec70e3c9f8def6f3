"""Reference: /root/reference/Modules/Pad1D.py."""

from enum import Enum

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels import pad as Pad
from puzzlelib_tpu.modules.module import ModuleError, Module


class PadMode(str, Enum):
    constant = "constant"
    reflect = "reflect"


class Pad1D(Module):
    def __init__(self, pad, mode="constant", fillValue=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.mode = PadMode(mode)
        self.pad = self.repeat(pad, 2)
        self.fillValue = 0 if fillValue is None else fillValue

    def updateData(self, data):
        lpad, rpad = self.pad

        if self.mode == PadMode.constant:
            insize = data.shape[2]
            outsize = insize + lpad + rpad

            self.data = gpuarray.empty(data.shape[:2] + (outsize, ), dtype=np.float32, allocator=memPool)
            self.data.fill(self.fillValue)
            self.data[:, :, lpad:outsize - rpad] = data

        elif self.mode == PadMode.reflect:
            self.data = Pad.reflectpad1d(data, self.pad)

        else:
            raise NotImplementedError(self.mode)

    def updateGrad(self, grad):
        lpad, rpad = self.pad

        if self.mode == PadMode.constant:
            size = grad.shape[2]
            self.grad = grad[:, :, lpad:size - rpad].copy(allocator=memPool)

        elif self.mode == PadMode.reflect:
            self.grad = Pad.reflectpad1dBackward(grad, self.pad)

        else:
            raise NotImplementedError(self.mode)

    def checkDataShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Data must be 3d tensor")

    def checkGradShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Grad must be 3d tensor")

        lpad, rpad = self.pad
        if shape[2] < lpad + rpad + 1:
            raise ModuleError("Grad size is too small (got %d, expected >= %d)" % (shape[2], lpad + rpad + 1))

    def dataShapeFrom(self, shape):
        batchsize, maps, insize = shape
        lpad, rpad = self.pad

        return batchsize, maps, insize + lpad + rpad

    def gradShapeFrom(self, shape):
        batchsize, maps, outsize = shape
        lpad, rpad = self.pad

        return batchsize, maps, outsize - lpad - rpad

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
