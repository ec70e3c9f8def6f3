"""Reference: /root/reference/Modules/Pad2D.py."""

from enum import Enum

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels import pad as Pad
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
        upad, bpad, lpad, rpad = self.pad

        if self.mode == PadMode.constant:
            inh, inw = data.shape[2:]
            outh, outw = inh + upad + bpad, inw + lpad + rpad

            self.data = gpuarray.empty(data.shape[:2] + (outh, outw), dtype=np.float32, allocator=memPool)
            self.data.fill(self.fillValue)
            self.data[:, :, upad:outh - bpad, lpad:outw - rpad] = data

        elif self.mode == PadMode.reflect:
            self.data = Pad.reflectpad2d(data, self.pad)

        else:
            raise NotImplementedError(self.mode)

    def updateGrad(self, grad):
        upad, bpad, lpad, rpad = self.pad

        if self.mode == PadMode.constant:
            height, width = grad.shape[2:]
            self.grad = grad[:, :, upad:height - bpad, lpad:width - rpad].copy(allocator=memPool)

        elif self.mode == PadMode.reflect:
            self.grad = Pad.reflectpad2dBackward(grad, self.pad)

        else:
            raise NotImplementedError(self.mode)

    def checkDataShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Data must be 4d tensor")

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")

        upad, bpad, lpad, rpad = self.pad
        height, width = shape[2:]

        if height < upad + bpad + 1:
            raise ModuleError("Grad maps height is too small (got %d, expected >= %d)" % (height, upad + bpad + 1))

        if width < lpad + rpad + 1:
            raise ModuleError("Grad maps width is too small (got %d, expected >= %d)" % (width, lpad + rpad + 1))

    def dataShapeFrom(self, shape):
        batchsize, maps, inh, inw = shape
        upad, bpad, lpad, rpad = self.pad

        return batchsize, maps, inh + upad + bpad, inw + lpad + rpad

    def gradShapeFrom(self, shape):
        batchsize, maps, outh, outw = shape
        upad, bpad, lpad, rpad = self.pad

        return batchsize, maps, outh - upad - bpad, outw - lpad - rpad

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
