"""Inverted dropout (reference: /root/reference/Modules/Dropout.py).

The random mask is drawn as uint32 thresholded against ``partition`` exactly
like the reference kernel (b < v) / p; the byte-packing dance of the CUDA
implementation is unnecessary here.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import dropoutKer
from puzzlelib_tpu.modules.module import Module


class Dropout(Module):
    def __init__(self, p=0.5, rng=None, slicing=None, inplace=False, name=None):
        super().__init__(name)
        self.registerBlueprint(locals(), exclude=["rng"])

        from puzzlelib_tpu.rng import globalRng

        self.p = p
        self.partition = None
        self.rng = globalRng if rng is None else rng
        self.rands = None
        self.slice = slicing

        self.inplace = inplace
        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

    def _drawRands(self, size):
        rands = gpuarray.empty((size, ), dtype=np.uint32, allocator=memPool)
        self.rng.fillInteger(rands)
        return rands

    def updateData(self, data):
        if self.train:
            self.data = data if self.inplace else gpuarray.empty(data.shape, dtype=data.dtype, allocator=memPool)

            self.rands = self._drawRands(data.size).reshape(data.shape)

            p = 1.0 - self.p
            self.partition = np.uint32(int(p * np.iinfo(np.uint32).max))

            dropoutKer(data.dtype)(self.data, data, self.rands, self.partition, np.float32(p), slice=self.slice)

        else:
            self.data = data

    def updateGrad(self, grad):
        if self.train:
            self.grad = grad if self.inplace else gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
            dropoutKer(grad.dtype)(self.grad, grad, self.rands, self.partition, np.float32(1.0 - self.p),
                                   slice=self.slice)
        else:
            self.grad = grad

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def reset(self):
        super().reset()
        self.rands = None

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
